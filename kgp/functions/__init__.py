from kgp.functions.surrogate import (  # noqa: F401
    bio_decode,
    bio_encode,
    build_emissions,
    char_ngrams,
    jaccard,
    normalize_text,
    scan_relation,
    tokenize,
    viterbi,
)

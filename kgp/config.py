"""Pipeline configuration (single dataclass — SURVEY.md §7 design stance)."""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class PipelineConfig:
    # --- document assembly (SURVEY A2/W1) ---
    max_turns_per_doc: int = 1024  # conversations longer than this are segmented
    assembly_salt_buckets: int = 16  # two-stage salted collect (north_rule skew)

    # --- mention detection (F1/F2) ---
    label_scheme: str = "v1"  # sub-token relabel scheme, P7 (v1 B,I,I / v2 B,O,O / v3 B,PAD,PAD)
    max_seq_len: int = 512  # truncation bound, P5 analogue

    # --- pair generation (J10) ---
    re_same_turn_only: bool = True  # RE pairs are intra-turn (reference is sentence-level)
    coref_turn_window: int = 4  # cross-turn pairing window for coreference
    pair_salt_buckets: int = 16

    # --- entity linking (J1/J2, F6, W2, P14) ---
    recall_top_k: int = 8  # candidate recall size (reference uses ES top-128)
    ngram_size: int = 3  # char-ngram shingle for the recall join
    link_threshold: float = 0.35  # P14 threshold on the cross-encoder score

    # --- coref clustering (A14) ---
    coref_threshold: float = 0.5
    cc_max_iters: int = 20  # hash-min connected-components iteration cap
    cc_buckets: int = 256  # MINIMUM conv-hash buckets for the union-find cogroup
    # per-task memory bound for the union-find cogroup: bucket count is
    # derived as max(cc_buckets, ceil(n_mentions / uf_max_bucket_rows)),
    # so a 100x input gets 100x buckets instead of 100x frames per task
    uf_max_bucket_rows: int = 2_000_000

    # --- physical ---
    shuffle_partitions: int = 32
    conv_buckets: int = 16  # bucket(conv_id) partition spec analogue
    arrow_batch_rows: int = 2048

    # --- lineage / resume ---
    lineage_dir_name: str = "_lineage"

    tool_names: tuple = ("search", "calculator", "browser", "db")


DEFAULT_CONFIG = PipelineConfig()


@dataclass(frozen=True)
class FixtureConfig:
    """Deterministic synthetic-data knobs (FIXTURES.md §A)."""

    seed: int = 42
    n_entities: int = 120
    n_conversations: int = 200
    mean_turns: int = 10
    max_turns: int = 60
    skew_conv_turns: int = 0  # >0 adds one giant conversation (skew test / bench)
    entities_per_conv: tuple = (2, 6)
    coref_repeat_prob: float = 0.45
    relation_turn_prob: float = 0.5
    variant_surface_prob: float = 0.3  # use a non-alias surface form (fuzzy-EL path)

"""Deterministic synthetic fixtures (FIXTURES.md §A).

Generates, from a seed only (no external data):

- a gazetteer of entities with canonical names, dictionary aliases and
  extra "variant" surface forms (the fuzzy-EL path — known to the tagger
  but NOT in the alias dictionary, so linking must go through the
  ngram-recall + cross-encoder stage),
- the ``alias_dict`` table mirroring the ES index doc shape
  (entity_name, alias, code, entity_id=md5(name--code) — parity with
  Entity_Linking/lesson6/data_process/prepare_el_index.py:27-29),
- the ``transcripts`` table (conv_id, turn_idx, role, text, tool, ts) with
  planted mention / relation-trigger / coreference signal, Zipf-ish turn
  counts, and an optional giant skew conversation.

Everything is byte-stable across runs and platforms: a single
``numpy.random.Generator(PCG64(seed))`` drives all choices, iteration
order is list-based (no set/dict order dependence), and text is built from
closed vocabularies. Vocabularies are mutually disjoint (filler ∩ trigger ∩
gazetteer-token = ∅) so the surrogate tagger has exact signal.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass
from datetime import datetime, timedelta, timezone

import numpy as np

from kgp.config import FixtureConfig
from kgp.functions.surrogate import TRIGGER2REL, tokenize

ROLES = ("user", "assistant", "tool")
TOOLS = ("search", "calculator", "browser", "db")

# filler vocabulary — disjoint from triggers and from every gazetteer token
FILLER = (
    "the a an then so well now today please kindly maybe still just"
    " quite very really about around near with without under over"
    " report status update note detail item record value number level"
    " check review confirm verify summary context thread message reply"
).split()

_CONSONANTS = list("bcdfgklmnprstvz")
_VOWELS = list("aeiou")

ORG_SUFFIXES = ("corp", "inc", "labs", "group")
ORG_VARIANT_SUFFIX = {
    "corp": "corporation",
    "inc": "incorporated",
    "labs": "laboratories",
    "group": "holdings",
}
LOC_SUFFIXES = ("city", "valley", "harbor", "ridge")
MISC_SUFFIXES = ("protocol", "device", "format", "framework")


@dataclass
class Entity:
    idx: int
    etype: str  # PER/ORG/LOC/MISC
    canonical: str  # canonical entity_name
    aliases: list  # surfaces present in alias_dict (includes canonical)
    variants: list  # surfaces known to the tagger but NOT in alias_dict
    code: str
    entity_id: str  # md5(canonical--code)

    @property
    def surfaces(self):
        return self.aliases + self.variants


def _synth_word(rng: np.random.Generator, used: set, syllables=(2, 3)) -> str:
    while True:
        k = int(rng.integers(syllables[0], syllables[1] + 1))
        w = "".join(
            _CONSONANTS[int(rng.integers(len(_CONSONANTS)))] + _VOWELS[int(rng.integers(len(_VOWELS)))]
            for _ in range(k)
        )
        if w not in used and w not in TRIGGER2REL and w not in FILLER:
            used.add(w)
            return w


def make_gazetteer(cfg: FixtureConfig) -> list[Entity]:
    rng = np.random.default_rng(np.random.PCG64(cfg.seed))
    used: set = set(FILLER) | set(TRIGGER2REL)
    used.update(ORG_SUFFIXES + LOC_SUFFIXES + MISC_SUFFIXES + tuple(ORG_VARIANT_SUFFIX.values()))
    entities = []
    types = ["PER", "ORG", "LOC", "MISC"]
    for i in range(cfg.n_entities):
        etype = types[i % 4]
        core = _synth_word(rng, used)
        if etype == "PER":
            last = _synth_word(rng, used)
            canonical = f"{core} {last}"
            aliases = [canonical, core]
            variants = [f"{core} {last} jr"] if rng.random() < 0.5 else []
        elif etype == "ORG":
            suf = ORG_SUFFIXES[int(rng.integers(len(ORG_SUFFIXES)))]
            canonical = f"{core} {suf}"
            aliases = [canonical, core]
            variants = [f"{core} {ORG_VARIANT_SUFFIX[suf]}"]
        elif etype == "LOC":
            suf = LOC_SUFFIXES[int(rng.integers(len(LOC_SUFFIXES)))]
            canonical = f"{core} {suf}"
            aliases = [canonical]
            variants = [core]
        else:  # MISC
            suf = MISC_SUFFIXES[int(rng.integers(len(MISC_SUFFIXES)))]
            canonical = f"{core} {suf}"
            aliases = [canonical, core]
            variants = [f"{core} {suf} v2"] if rng.random() < 0.5 else []
        code = f"C{i:03d}.{i % 10}"
        entity_id = hashlib.md5(f"{canonical}--{code}".encode()).hexdigest()
        entities.append(Entity(i, etype, canonical, aliases, variants, code, entity_id))
    return entities


def alias_dict_rows(entities: list[Entity]) -> list[dict]:
    """FIXTURES.md §A2 — one row per (entity, alias)."""
    return [
        {"entity_name": e.canonical, "alias": a, "code": e.code, "entity_id": e.entity_id}
        for e in entities
        for a in e.aliases
    ]


def tagger_surfaces(entities: list[Entity]) -> list[tuple[str, str]]:
    """All surface forms the surrogate tagger knows: (surface, type)."""
    return [(s, e.etype) for e in entities for s in e.surfaces]


_TRIGGERS = sorted(TRIGGER2REL)  # deterministic order
_BASE_TS = datetime(2025, 1, 1, tzinfo=timezone.utc)


def _filler(rng, lo, hi) -> list[str]:
    n = int(rng.integers(lo, hi + 1))
    return [FILLER[int(rng.integers(len(FILLER)))] for _ in range(n)]


def _pick_surface(rng, ent: Entity, variant_prob: float) -> str:
    if ent.variants and rng.random() < variant_prob:
        return ent.variants[int(rng.integers(len(ent.variants)))]
    return ent.aliases[int(rng.integers(len(ent.aliases)))]


def make_transcripts(cfg: FixtureConfig, entities: list[Entity] | None = None) -> list[dict]:
    """Rows of the transcripts table (exact input_hint shape)."""
    entities = entities or make_gazetteer(cfg)
    rng = np.random.default_rng(np.random.PCG64([cfg.seed, 7]))
    rows = []
    n_conv = cfg.n_conversations
    lo, hi = cfg.entities_per_conv
    for c in range(n_conv):
        conv_id = f"conv-{c:06d}"
        # Zipf-ish turn counts: many short, few long
        n_turns = 2 + min(int(rng.pareto(1.6) * cfg.mean_turns / 2), cfg.max_turns)
        if cfg.skew_conv_turns and c == 0:
            n_turns = cfg.skew_conv_turns
        k = int(rng.integers(lo, min(hi, len(entities)) + 1))
        conv_ents = [entities[int(i)] for i in rng.choice(len(entities), size=k, replace=False)]
        mentioned: list[Entity] = []
        for t in range(n_turns):
            role = ROLES[t % 3]
            tool = TOOLS[int(rng.integers(len(TOOLS)))] if role == "tool" else None
            parts = _filler(rng, 1, 3)
            r = rng.random()
            if r < cfg.relation_turn_prob and len(conv_ents) >= 2:
                i, j = rng.choice(len(conv_ents), size=2, replace=False)
                e1, e2 = conv_ents[int(i)], conv_ents[int(j)]
                trig = _TRIGGERS[int(rng.integers(len(_TRIGGERS)))]
                parts += [_pick_surface(rng, e1, cfg.variant_surface_prob), trig]
                parts += _filler(rng, 0, 1)
                parts += [_pick_surface(rng, e2, cfg.variant_surface_prob), "."]
                mentioned += [e1, e2]
            elif r < cfg.relation_turn_prob + cfg.coref_repeat_prob and mentioned:
                ent = mentioned[int(rng.integers(len(mentioned)))]
                parts += [_pick_surface(rng, ent, cfg.variant_surface_prob)]
                parts += _filler(rng, 1, 2) + ["."]
            else:
                parts += _filler(rng, 2, 5) + ["."]
            rows.append(
                {
                    "conv_id": conv_id,
                    "turn_idx": t,
                    "role": role,
                    "text": " ".join(parts),
                    "tool": tool,
                    "ts": _BASE_TS + timedelta(seconds=t),
                }
            )
    return rows


# ---------------------------------------------------------------------------
# Spark-side materialization helpers
# ---------------------------------------------------------------------------

TRANSCRIPT_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
)
ALIAS_SCHEMA = "entity_name string, alias string, code string, entity_id string"


def transcripts_df(spark, cfg: FixtureConfig):
    rows = make_transcripts(cfg)
    return spark.createDataFrame(rows, schema=TRANSCRIPT_SCHEMA)


def alias_df(spark, cfg: FixtureConfig):
    # via pandas -> Arrow: a plain-list createDataFrame round-trips every
    # row through pickled Python partitions (and per-task Python workers)
    # each time the dictionary is broadcast-built; Arrow conversion is one
    # driver-side columnar handoff
    import pandas as pd

    rows = alias_dict_rows(make_gazetteer(cfg))
    return spark.createDataFrame(pd.DataFrame(rows), schema=ALIAS_SCHEMA)


def fixture_config_for_sf(sf: float, skew: bool = False) -> FixtureConfig:
    """Scale knobs: sf 0.001 -> ~60 convs, 0.01 -> ~600, 0.1 -> ~6000."""
    n_conv = max(20, int(60000 * sf))
    return FixtureConfig(
        n_conversations=n_conv,
        skew_conv_turns=10_000 if skew else 0,
    )


def sf_from_dir(sf_dir: str) -> float:
    import re as _re

    m = _re.search(r"sf([0-9.]+)", sf_dir)
    return float(m.group(1)) if m else 0.01


# ---------------------------------------------------------------------------
# Reference-format micro-fixtures (FIXTURES.md §B) — reader tests
# ---------------------------------------------------------------------------


def write_reference_format_fixtures(outdir: str) -> dict:
    """Write tiny files in each reference on-disk format; returns paths."""
    import json
    import os

    os.makedirs(outdir, exist_ok=True)
    paths = {}

    semeval = [
        {"token": ["the", "acme", "engine", "causes", "loud", "noise", "."],
         "h": {"name": "acme engine", "pos": [1, 3]},
         "t": {"name": "noise", "pos": [5, 6]},
         "relation": "Cause-Effect(e1,e2)"},
        {"token": ["bolt", "inside", "box", "."],
         "h": {"name": "bolt", "pos": [0, 1]},
         "t": {"name": "box", "pos": [2, 3]},
         "relation": "Content-Container(e1,e2)"},
        {"token": ["bad", "span", "row"],
         "h": {"name": "mismatch", "pos": [0, 1]},
         "t": {"name": "row", "pos": [2, 3]},
         "relation": "Other"},
    ]
    paths["semeval"] = os.path.join(outdir, "re_semeval_sample.jsonl")
    with open(paths["semeval"], "w") as f:
        for r in semeval:
            f.write(json.dumps(r) + "\n")

    mrc = [
        {"context": "alice works at acme", "qas_id": "0.0", "entity_label": "PER",
         "start_position": [0], "end_position": [0], "impossible": False},
        {"context": "alice works at acme", "qas_id": "0.1", "entity_label": "ORG",
         "start_position": [3], "end_position": [3], "impossible": False},
        {"context": "nothing here", "qas_id": "1.0", "entity_label": "PER",
         "start_position": [], "end_position": [], "impossible": True},
        {"context": "nothing here", "qas_id": "1.1", "entity_label": "ORG",
         "start_position": [], "end_position": [], "impossible": True},
    ]
    paths["mrc"] = os.path.join(outdir, "ner_mrc_sample.json")
    with open(paths["mrc"], "w") as f:
        json.dump(mrc, f)

    ccks = [
        {"sentence": "acme hired bob", "labeled entities": [["0", "1", "ORG"], ["2", "3", "PER"]]},
        {"sentence": "plain text", "labeled entities": []},
    ]
    paths["ccks"] = os.path.join(outdir, "ner_ccks_sample.json")
    with open(paths["ccks"], "w") as f:
        json.dump(ccks, f)

    paths["el_pairs"] = os.path.join(outdir, "el_pairs_sample.tsv")
    with open(paths["el_pairs"], "w") as f:
        f.write("fever\thigh fever\t1\nfever\tbroken leg\t0\n")

    paths["cdn"] = os.path.join(outdir, "el_cdn_sample.json")
    with open(paths["cdn"], "w") as f:
        json.dump([{"text": " fever and cough ", "normalized_result": "Fever##Cough"}], f)

    paths["kg"] = os.path.join(outdir, "kg_triples_sample.txt")
    with open(paths["kg"], "w") as f:
        f.write("0 0 1\n1 1 2\n0 0 1\n")

    paths["cf"] = os.path.join(outdir, "cf_adjacency_sample.txt")
    with open(paths["cf"], "w") as f:
        f.write("0 10 11 11 12\n1 10\n\n")

    paths["remap"] = os.path.join(outdir, "id_remap_sample.txt")
    with open(paths["remap"], "w") as f:
        f.write("org_id remap_id\nm.045wq1q 0\nm.03_28m 1\n")
    return paths


def attention_fixture(n_ent: int = 40, n_rel: int = 4, d: int = 8, d_r: int = 4):
    """Deterministic KGAT embedding matrices for the F7 certification:
    fixed integer arithmetic mapped to small rationals (no RNG, no
    transcendentals in generation), so the Python floats shipped to the
    pandas UDF and the repr() literals embedded in the DuckDB twin parse
    to bit-identical doubles. -> (ent_emb, rel_emb, rel_w) nested lists."""
    ent = [[((i * 31 + j * 17) % 97 - 48) / 48 for j in range(d)] for i in range(n_ent)]
    rel = [[((i * 13 + j * 7) % 53 - 26) / 26 for j in range(d_r)] for i in range(n_rel)]
    w = [
        [[((i * 29 + j * 11 + k * 5) % 71 - 35) / 35 for k in range(d)] for j in range(d_r)]
        for i in range(n_rel)
    ]
    return ent, rel, w


def aggregate_fixture(d: int = 8, d_out: int = 6):
    """Deterministic bi-interaction weight matrices (W1, W2: d x d_out) for
    the kgat_aggregate certification — same small-rational scheme as
    :func:`attention_fixture` so Python floats and the DuckDB twin's
    repr() literals parse bit-identically."""
    w1 = [[((i * 19 + j * 23) % 61 - 30) / 30 for j in range(d_out)] for i in range(d)]
    w2 = [[((i * 37 + j * 41) % 67 - 33) / 33 for j in range(d_out)] for i in range(d)]
    return w1, w2


def cf_layer_fixture(dims=(8, 6, 4)):
    """Deterministic per-layer bi-interaction weights for the stacked
    cf_embedding certification (KGAT-pytorch/model/KGAT.py:88-99
    ``conv_dim_list`` — the reference's default [64, 32, 16] halves per
    layer; this scales that shape down to the fixture dims). Layer k maps
    dims[k] -> dims[k+1]; a per-layer salt keeps the matrices distinct
    under the same small-rational scheme as :func:`aggregate_fixture`.
    -> list of (W1, W2) pairs, one per layer."""
    layers = []
    for k in range(len(dims) - 1):
        d_in, d_out, s = dims[k], dims[k + 1], 7 * k
        w1 = [
            [((i * 19 + j * 23 + s) % 61 - 30) / 30 for j in range(d_out)]
            for i in range(d_in)
        ]
        w2 = [
            [((i * 37 + j * 41 + s) % 67 - 33) / 33 for j in range(d_out)]
            for i in range(d_in)
        ]
        layers.append((w1, w2))
    return layers


def sanity_check_vocab(entities: list[Entity]) -> None:
    """Invariant: filler/trigger/gazetteer token sets are disjoint and every
    surface round-trips through the tokenizer unchanged."""
    gaz_tokens = {t for e in entities for s in e.surfaces for t in tokenize(s)}
    assert not gaz_tokens & set(FILLER), gaz_tokens & set(FILLER)
    assert not gaz_tokens & set(TRIGGER2REL), gaz_tokens & set(TRIGGER2REL)
    assert not set(FILLER) & set(TRIGGER2REL)
    for e in entities:
        for s in e.surfaces:
            assert " ".join(tokenize(s)) == s, s

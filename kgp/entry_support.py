"""Fixture + gold materialization backing ``__spark_entry__.py``.

The KG pipeline's input (transcripts) is not part of the driver-provided
testdata, so it is synthesized deterministically per scale factor (seeded
— BASELINE.json input_hint) and written once under
``<repo>/fixtures/<sfname>/``. For correctness-checked scales the
single-process oracle's outputs (gold mentions/relations/clusters/links/
triples/edges) are materialized next to it so the DuckDB oracle SQL can
read them with ``read_parquet`` — the driver's side-by-side compare then
IS the Spark-vs-oracle differential.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

from kgp.config import FixtureConfig
from kgp.fixtures import (
    alias_dict_rows,
    fixture_config_for_sf,
    make_gazetteer,
    make_transcripts,
    sf_from_dir,
)

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURE_ROOT = os.path.join(REPO_ROOT, "fixtures")

# gold is only materialized at correctness scales (oracle is single-process)
GOLD_MAX_SF = 0.011


def fixture_dir(sf_dir: str) -> str:
    return os.path.join(FIXTURE_ROOT, os.path.basename(os.path.normpath(sf_dir)) or "sf0.01")


def _write(path: str, rows: list[dict], schema: pa.Schema | None = None) -> None:
    if rows:
        table = pa.Table.from_pylist(rows, schema=schema)
    else:
        table = pa.Table.from_pylist([], schema=schema)
    tmp = path + ".tmp"
    # modest row groups keep a single fixture file splittable by Spark
    # (one row group = one indivisible scan unit)
    pq.write_table(table, tmp, row_group_size=50_000)
    os.replace(tmp, path)


_TRANSCRIPT_PA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us", tz="UTC")),
    ]
)

_GOLD_SCHEMAS = {
    "gold_mentions": pa.schema(
        [
            ("conv_id", pa.string()),
            ("turn_idx", pa.int64()),
            ("start", pa.int64()),
            ("end", pa.int64()),
            ("mention", pa.string()),
            ("label", pa.string()),
            ("mention_id", pa.int64()),
        ]
    ),
    "gold_relations": pa.schema(
        [
            ("conv_id", pa.string()),
            ("turn_idx", pa.int64()),
            ("head_mention_id", pa.int64()),
            ("tail_mention_id", pa.int64()),
            ("rel_id", pa.int64()),
            ("rel", pa.string()),
            ("score", pa.float64()),
        ]
    ),
    "gold_clusters": pa.schema(
        [("conv_id", pa.string()), ("mention_id", pa.int64()), ("cluster_id", pa.int64())]
    ),
    "gold_links": pa.schema(
        [("cluster_id", pa.int64()), ("entity_id", pa.string()), ("score", pa.float64())]
    ),
    "gold_candidates": pa.schema(
        [
            ("cluster_id", pa.int64()),
            ("surface", pa.string()),
            ("alias", pa.string()),
            ("entity_id", pa.string()),
            ("score", pa.float64()),
        ]
    ),
    "gold_triples": pa.schema(
        [
            ("conv_id", pa.string()),
            ("subj", pa.string()),
            ("pred", pa.string()),
            ("obj", pa.string()),
            ("src_turns", pa.string()),  # comma-joined for hash-stable compare
        ]
    ),
    "gold_edges": pa.schema([("h", pa.int64()), ("r", pa.int64()), ("t", pa.int64())]),
}
# the biaffine detector's gold shares the mention schema
_GOLD_SCHEMAS["gold_mentions_biaffine"] = _GOLD_SCHEMAS["gold_mentions"]


def ensure_fixtures(sf_dir: str) -> str:
    """Idempotently materialize transcripts/alias_dict (+ gold at small sf).

    Returns the fixture directory. Cheap when files already exist.
    """
    sf = sf_from_dir(sf_dir)
    fdir = fixture_dir(sf_dir)
    os.makedirs(fdir, exist_ok=True)
    t_path = os.path.join(fdir, "transcripts.parquet")
    a_path = os.path.join(fdir, "alias_dict.parquet")
    want_gold = sf <= GOLD_MAX_SF
    gold_paths = {k: os.path.join(fdir, f"{k}.parquet") for k in _GOLD_SCHEMAS}
    have_all = os.path.exists(t_path) and os.path.exists(a_path) and (
        not want_gold or all(os.path.exists(p) for p in gold_paths.values())
    )
    if have_all:
        return fdir

    fx = fixture_config_for_sf(sf, skew=sf >= 0.05)
    gaz = make_gazetteer(fx)
    rows = make_transcripts(fx, gaz)
    _write(t_path, rows, _TRANSCRIPT_PA)
    _write(a_path, alias_dict_rows(gaz))

    if want_gold:
        from kgp.oracle import oracle_mentions, oracle_pipeline

        gold = oracle_pipeline(rows, gaz)
        _write(gold_paths["gold_mentions"], gold["mentions"], _GOLD_SCHEMAS["gold_mentions"])
        _write(
            gold_paths["gold_mentions_biaffine"],
            oracle_mentions(rows, gaz, detector="biaffine"),
            _GOLD_SCHEMAS["gold_mentions_biaffine"],
        )
        _write(gold_paths["gold_relations"], gold["relations"], _GOLD_SCHEMAS["gold_relations"])
        _write(gold_paths["gold_clusters"], gold["clusters"], _GOLD_SCHEMAS["gold_clusters"])
        _write(gold_paths["gold_links"], gold["links"], _GOLD_SCHEMAS["gold_links"])
        _write(
            gold_paths["gold_candidates"], gold["candidates"], _GOLD_SCHEMAS["gold_candidates"]
        )
        triples = [
            {**t, "src_turns": ",".join(str(x) for x in t["src_turns"])}
            for t in gold["triples"]
        ]
        _write(gold_paths["gold_triples"], triples, _GOLD_SCHEMAS["gold_triples"])
        edges = [{"h": h, "r": r, "t": t} for h, r, t in gold["edges"]]
        _write(gold_paths["gold_edges"], edges, _GOLD_SCHEMAS["gold_edges"])
    return fdir


def fixture_model_for(spark, sf_dir: str):
    """PipelineModel matching the fixtures of this sf_dir."""
    from kgp.stages.pipeline import fixture_model

    sf = sf_from_dir(sf_dir)
    return fixture_model(spark, fixture_config_for_sf(sf, skew=sf >= 0.05))


def load_transcripts(spark, sf_dir: str):
    fdir = ensure_fixtures(sf_dir)
    return spark.read.parquet(os.path.join(fdir, "transcripts.parquet"))

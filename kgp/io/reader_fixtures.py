"""Deterministic micro-fixtures in the REFERENCE's own on-disk formats
(SURVEY.md §2.1 S1-S7), backing the driver-certified reader queries.

Each writer emits the exact textual shape the reference consumes:

- SemEval RE JSONL (data_loader.py:97-117) incl. rows violating the P3
  ``" ".join(tokens[s:e]) == name`` invariant (quarantine path);
- MRC NER JSON (ner_data_utils.py:270-323): label_num query-rows per
  sentence, qas_id = "<sample>.<label>", inclusive end positions,
  ``impossible`` rows with empty span lists;
- CCKS/kgclue NER JSON (ner_data_utils.py:253-267);
- EL pair TSV (prepare_training_datasets.py:102-103);
- CHIP-CDN EL JSON with ``##``-joined multi-entity golds
  (eval_el.py:302-317);
- KG triple text + CF adjacency text + id-remap text
  (loader_kgat.py:46-81, entity_list.txt).

Content is synthesized from fixed integer arithmetic (no RNG, no clock):
byte-identical across runs, so the DuckDB oracle SQL can re-parse the
same files (kgp/oracles.py reader twins) and the driver's side-by-side
compare certifies the PARSERS, not the data.
"""

from __future__ import annotations

import json
import os

WORDS = [
    "the", "acme", "corp", "river", "delta", "unit", "ships", "to",
    "harbor", "node", "gamma", "report", "from", "sensor", "array",
]
LABELS3 = ["ORG", "LOC", "PER"]
RELS = ["Component-Whole(e2,e1)", "Cause-Effect(e1,e2)", "Other"]


def _write(path: str, text: str) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        f.write(text)
    os.replace(tmp, path)


def _tokens(i: int, n: int) -> list[str]:
    return [WORDS[(i * 7 + j * 3) % len(WORDS)] for j in range(n)]


def write_semeval_jsonl(path: str, n: int = 60) -> None:
    """n examples; every 10th violates the head-name/position invariant
    (exercises the P3 quarantine split)."""
    lines = []
    for i in range(n):
        toks = _tokens(i, 8 + i % 5)
        hs = i % 3
        he = hs + 1 + i % 2
        ts = he + 1
        te = ts + 1
        head = " ".join(toks[hs:he])
        if i % 10 == 9:  # corrupted: name disagrees with the span
            head = head + "_XX"
        lines.append(
            json.dumps(
                {
                    "token": toks,
                    "h": {"name": head, "pos": [hs, he]},
                    "t": {"name": " ".join(toks[ts:te]), "pos": [ts, te]},
                    "relation": RELS[i % len(RELS)],
                },
                ensure_ascii=False,
            )
        )
    _write(path, "\n".join(lines) + "\n")


def write_mrc_json(path: str, n_samples: int = 20) -> None:
    """label_num=3 query rows per sample, qas_id='<sample>.<label_idx>';
    END POSITIONS INCLUSIVE (the reference adds +1 at feature build);
    impossible rows carry empty position lists."""
    rows = []
    for i in range(n_samples):
        toks = _tokens(i, 10)
        context = " ".join(toks)
        for k, label in enumerate(LABELS3):
            has = (i + k) % 3 != 0  # ~2/3 of (sample, label) rows have spans
            starts, ends = [], []
            if has:
                s = (i + k) % 6
                starts.append(s)
                ends.append(s + (i % 2))  # inclusive end
                if (i + k) % 4 == 0:  # a second span for multi-span regroup
                    starts.append(s + 3)
                    ends.append(s + 3)
            rows.append(
                {
                    "context": context,
                    "qas_id": f"{i}.{k}",
                    "entity_label": label,
                    "start_position": starts,
                    "end_position": ends,
                    "impossible": not has,
                }
            )
    _write(path, json.dumps(rows, ensure_ascii=False, indent=1))


def write_ccks_json(path: str, n: int = 25) -> None:
    rows = []
    for i in range(n):
        toks = _tokens(i + 3, 9)
        sent = " ".join(toks)
        ents = []
        for k in range((i % 3) + 1):
            s = (i + 2 * k) % 7
            ents.append([str(s), str(s + 1), LABELS3[(i + k) % 3]])
        rows.append({"sentence": sent, "labeled entities": ents})
    _write(path, json.dumps(rows, ensure_ascii=False, indent=1))


def write_el_pairs_tsv(path: str, n: int = 40) -> None:
    lines = []
    for i in range(n):
        a = " ".join(_tokens(i, 3))
        b = " ".join(_tokens(i + 5, 3))
        lines.append(f"{a}\t{b}\t{i % 2}")
    _write(path, "\n".join(lines) + "\n")


def write_cdn_json(path: str, n: int = 20) -> None:
    rows = []
    for i in range(n):
        golds = "##".join(" ".join(_tokens(i + k, 2)) for k in range((i % 2) + 1))
        rows.append({"text": " " + " ".join(_tokens(i, 4)) + " ", "normalized_result": golds})
    _write(path, json.dumps(rows, ensure_ascii=False, indent=1))


def write_kg_triples_txt(path: str, n: int = 80) -> None:
    lines = [f"{(i * 13) % 37} {i % 5} {(i * 7 + 3) % 37}" for i in range(n)]
    _write(path, "\n".join(lines) + "\n")


def write_cf_adjacency_txt(path: str, n_users: int = 15) -> None:
    """'user item item ...' lines with deliberate duplicate items (the
    reference np.unique's them, loader_kgat.py:59) and one blank line."""
    lines = []
    for u in range(n_users):
        items = [(u * 11 + j * 3) % 29 for j in range(2 + u % 4)]
        items.append(items[0])  # duplicate -> exercises per-user dedup
        lines.append(str(u) + " " + " ".join(str(x) for x in items))
        if u == 7:
            lines.append("")  # blank line must be skipped
    _write(path, "\n".join(lines) + "\n")


def write_id_remap_txt(path: str, n: int = 30) -> None:
    lines = ["org_id remap_id"]
    lines += [f"ent{(i * 17) % 97:03d} {i}" for i in range(n)]
    _write(path, "\n".join(lines) + "\n")


def write_icd_xlsx(path: str, n: int = 50) -> None:
    """S8 micro-fixture: the ICD-10 dictionary workbook shape
    (prepare_el_index.py:63-69) — header row + (code, name) string rows —
    plus a byte-equivalent CSV twin at <path>.csv so the DuckDB oracle
    can re-read the SAME logical content through its CSV reader (DuckDB
    has no xlsx scan; the cross-format equality is the certification).

    The workbook deliberately carries the two real-exporter edge cases
    (VERDICT r4 item 4): the first sheet is stored as ``sheet3.xml``
    (resolvable only through the workbook rels — a decoy ``sheet1.xml``
    sorts first lexicographically AND sits first in zip order), and every
    5th row is RAGGED (code only, no name cell) — the CSV twin encodes
    those names as '' so the certified query proves the ''-coalesce."""
    from kgp.io.xlsx import write_xlsx

    rows = []
    for i in range(n):
        code = f"{chr(ord('A') + i % 7)}{i % 90:02d}.{i % 10}"
        if i % 5 == 4:
            rows.append([code])  # ragged: missing trailing name cell
        else:
            name = " ".join(_tokens(i, 2 + i % 3)) + f" disorder {i}"
            rows.append([code, name])
    write_xlsx(
        path,
        rows,
        header=["code", "name"],
        sheet_member="xl/worksheets/sheet3.xml",
        decoy=("xl/worksheets/sheet1.xml", [["WRONG", "SHEET"], ["decoy", "rows"]]),
    )
    csv_lines = ["code,name"] + [
        f"{r[0]},{r[1] if len(r) > 1 else ''}" for r in rows
    ]
    _write(path + ".csv", "\n".join(csv_lines) + "\n")


FIXTURE_WRITERS = {
    "semeval.jsonl": write_semeval_jsonl,
    "mrc_ner.json": write_mrc_json,
    "ccks_ner.json": write_ccks_json,
    "el_pairs.tsv": write_el_pairs_tsv,
    "cdn.json": write_cdn_json,
    "kg_final.txt": write_kg_triples_txt,
    "cf_train.txt": write_cf_adjacency_txt,
    "entity_remap.txt": write_id_remap_txt,
    "icd_dict.xlsx": write_icd_xlsx,
}


def ensure_reader_fixtures(root: str) -> dict[str, str]:
    """Idempotently write all reader micro-fixtures under <root>/readers/;
    returns name -> absolute path."""
    d = os.path.join(root, "readers")
    os.makedirs(d, exist_ok=True)
    paths = {}
    for name, writer in FIXTURE_WRITERS.items():
        p = os.path.join(d, name)
        if not os.path.exists(p):
            writer(p)
        paths[name] = p
    return paths

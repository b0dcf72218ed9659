#!/usr/bin/env python3
"""Planted-corpus oracle parity harness (dev-only, driver-style).

The generated testdata contains NO empty/whitespace/NULL texts and no
tab/newline-edged documents, so the per-round correctness gates cannot
see a Spark-vs-DuckDB divergence that only manifests on those rows
(the r19 BM25 empty-token bug and the r20 phantom-token trim bug were
both of this class). This harness closes the oracle side of that blind
spot: it PLANTS a corpus full of exactly those rows, runs every
documents-only gated query through graft.Verify, and replays the same
oracle SQL in DuckDB with the tools/selfcheck.py compare.

Usage: python3 tools/planted_parity.py [plantedDir] [outDir]
(defaults /tmp/planted_sf /tmp/planted_out; run from the repo root)
"""
import json, os, re, subprocess, sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import selfcheck

# planted tables; gated queries referencing anything else are skipped
PLANTED = ["documents", "embeddings", "events"]
OTHER_TABLES = ["region", "nation", "customer", "supplier", "part",
                "orders", "lineitem"]


def planted_rows():
    """Deterministic corpus: normal docs across languages with URLs,
    PII, dup clusters and shared passages — plus the blind-spot rows:
    empty, whitespace-only, NULL texts, and tab/newline-edged docs."""
    rows = []
    en = ("the quick brown fox jumps over the lazy dog and that is "
          "not the end of it for the fox runs on with the hound in "
          "the field by the old mill where the miller sleeps")
    de = ("der alte mueller schlaeft und das ist nicht der ganze "
          "satz denn die muehle steht still und der fuchs rennt "
          "weiter durch das feld und die nacht ist lang")
    fr = ("le vieux meunier dort et les champs sont calmes et la "
          "nuit est longue et le renard court encore dans les bois "
          "pres des collines et des rivieres du nord")
    es = ("el viejo molinero duerme y los campos estan en calma y "
          "que la noche es larga y el zorro corre por el bosque "
          "cerca de la colina y de los rios del sur")
    zh = "的是了在和不的是了在和不的是了在和不的是了在和不"
    passage = ("shared boilerplate passage alpha beta gamma delta "
               "epsilon zeta eta theta iota kappa lambda mu nu xi "
               "omicron pi rho sigma tau upsilon phi chi psi omega "
               "one two three four five six seven eight nine ten")
    langs = [("en", en), ("de", de), ("fr", fr), ("es", es), ("zh", zh)]
    i = 1
    for rep in range(4):
        for lang, body in langs:
            text = f"{body} rep{rep} tail{i}"
            rows.append((i, text, lang, f"src{i % 3}"))
            i += 1
    # exact-dup cluster (same body, three ids) for d1/d36/d6*
    for k in range(3):
        rows.append((i, en + " exact copy cluster", "en", "srcdup"))
        i += 1
    # near-dup pair (one token differs) for d6b/d6d/d7b
    rows.append((i, en + " near copy cluster", "en", "srcdup")); i += 1
    # shared long passage in three docs for d27/d29
    for k in range(3):
        rows.append((i, f"document {i} opens here. {passage} and "
                     f"closes with its own unique suffix {i}",
                     "en", "srcpass"))
        i += 1
    # URLs + PII for d35/d11
    rows.append((i, "contact a@b.com or 555-123-4567 via "
                 "https://ex.ample.org/x and http://ex.ample.org/y "
                 "or https://other.site/z in the usual way",
                 "en", "srcnet")); i += 1
    # repetitive doc for d12/d18
    rows.append((i, "loop " * 60 + "end", "en", "srcrep")); i += 1
    # ---- the blind-spot rows ----
    rows.append((i, "", "en", "srcedge")); i += 1
    rows.append((i, " \t\n  ", "en", "srcedge")); i += 1
    rows.append((i, None, None, "srcedge")); i += 1
    rows.append((i, None, "en", None)); i += 1
    rows.append((i, "\ttab edged body with the usual fox and dog\n",
                 "en", "srcedge")); i += 1
    rows.append((i, "\n\nleading newlines then the quick brown fox\n",
                 "en", "srcedge")); i += 1
    # whitespace-padded exact dup of doc 1 (normalization collapse)
    rows.append((i, "  " + en + " rep0 tail1 \t\n", "en",
                 "srcedge")); i += 1
    return rows


def embedding_rows():
    """Deterministic 64-dim vectors (matching the testdata dim) with
    the vector blind spots: a NULL embedding, a wrong-dim vector, an
    empty array, a ZERO-NORM vector (cosine's 0/0 corner), an exact
    duplicate pair, and a NULL label."""
    import random
    rng = random.Random(20_26)
    rows = []
    for vid in range(1, 41):
        v = [round(rng.uniform(-1.0, 1.0), 4) for _ in range(64)]
        rows.append((vid, v, vid % 3))
    rows.append((41, rows[0][1], 1))          # exact dup of vec 1
    rows.append((42, [0.0] * 64, 0))          # zero norm
    rows.append((43, None, 0))                # NULL embedding
    rows.append((44, [1.0, 2.0, 3.0], 2))     # wrong dim
    rows.append((45, [], 0))                  # empty array
    rows.append((46, [round(rng.uniform(-1, 1), 4) for _ in range(64)],
                 None))                       # NULL label
    return rows


def event_rows():
    """Deterministic events with NULL user/type/value/props, duplicate
    (user, ts) pairs, and a NULL timestamp."""
    base = 1_700_000_000_000_000  # micros
    rows = []
    eid = 1
    for u in range(1, 9):
        for k in range(12):
            ts = base + (u * 97 + k * 61_000_000) * 1_000
            et = ["view", "click", "purchase"][k % 3]
            rows.append((eid, ts, u, et, round(0.5 * k, 2),
                         f'{{"k":{k}}}'))
            eid += 1
    rows.append((eid, base, 1, "view", 1.0, None)); eid += 1
    rows.append((eid, base, 1, "view", None, "{}")); eid += 1   # dup ts
    rows.append((eid, base + 5_000_000, None, "click", 2.0, "{}"))
    eid += 1                                                    # NULL user
    rows.append((eid, base + 6_000_000, 2, None, 3.0, "{}")); eid += 1
    rows.append((eid, None, 3, "view", 4.0, "{}")); eid += 1    # NULL ts
    return rows


def write_planted(planted_dir):
    os.makedirs(planted_dir, exist_ok=True)
    con = duckdb.connect()
    con.execute("CREATE TABLE docs (doc_id BIGINT, text VARCHAR, "
                "lang VARCHAR, source VARCHAR, n_chars BIGINT)")
    for (doc_id, text, lang, source) in planted_rows():
        n = None if text is None else len(text)
        con.execute("INSERT INTO docs VALUES (?, ?, ?, ?, ?)",
                    [doc_id, text, lang, source, n])
    con.execute(f"COPY docs TO '{planted_dir}/documents.parquet' "
                "(FORMAT PARQUET)")
    con.execute("CREATE TABLE embs (vec_id BIGINT, embedding FLOAT[], "
                "label INTEGER)")
    for (vid, v, label) in embedding_rows():
        con.execute("INSERT INTO embs VALUES (?, ?, ?)", [vid, v, label])
    con.execute(f"COPY embs TO '{planted_dir}/embeddings.parquet' "
                "(FORMAT PARQUET)")
    con.execute("CREATE TABLE evs (event_id BIGINT, ts TIMESTAMP, "
                "user_id BIGINT, event_type VARCHAR, value DOUBLE, "
                "props VARCHAR)")
    for (eid, ts, u, et, v, props) in event_rows():
        con.execute("INSERT INTO evs VALUES (?, make_timestamp(?), "
                    "?, ?, ?, ?)", [eid, ts, u, et, v, props])
    con.execute(f"COPY evs TO '{planted_dir}/events.parquet' "
                "(FORMAT PARQUET)")
    for t, n in con.execute(
            "SELECT 'docs', count(*) FROM docs UNION ALL "
            "SELECT 'embs', count(*) FROM embs UNION ALL "
            "SELECT 'evs', count(*) FROM evs").fetchall():
        print(f"planted {n} {t} rows")


def doc_only_names(oracle):
    sel = []
    for name, sql in sorted(oracle.items()):
        if not (name.startswith("d") or name.startswith("e")):
            continue
        low = sql.lower()
        if any(re.search(r"\b" + t + r"\b", low) for t in OTHER_TABLES):
            continue
        sel.append(name)
    return sel


def main():
    planted_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/planted_sf"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/planted_out"
    write_planted(planted_dir)
    # one full-oracle dump exists from any prior Verify run; absent
    # that, run Verify once un-filtered to learn the query list
    subset_src = f"{out_dir}/oracle_sql.json"
    if not os.path.exists(subset_src):
        subprocess.run(["sbt", "-batch",
                        f"runMain graft.Verify {planted_dir} {out_dir} "
                        "d1_dedup_exact"], check=True)
    names = doc_only_names(json.load(open(subset_src))) \
        if os.path.getsize(subset_src) > 2 else []
    if not names:
        print("no documents-only queries found", file=sys.stderr)
        sys.exit(2)
    print(f"running {len(names)} documents-only queries")
    subprocess.run(["sbt", "-batch",
                    f"runMain graft.Verify {planted_dir} {out_dir} "
                    + ",".join(names)], check=True)
    # restrict the oracle map to the subset so selfcheck skips the rest
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    json.dump({k: v for k, v in oracle.items() if k in names},
              open(f"{out_dir}/oracle_sql.json", "w"))
    selfcheck.main(planted_dir, out_dir)


if __name__ == "__main__":
    main()

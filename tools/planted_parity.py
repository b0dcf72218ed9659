#!/usr/bin/env python3
"""Planted-corpus oracle parity harness (dev-only, driver-style).

The generated testdata contains NO empty/whitespace/NULL texts, no
tab/newline-edged documents, no NULL vectors/event fields, and ZERO
NULLs in any TPC-H column — so the per-round correctness gates cannot
see a Spark-vs-DuckDB divergence that only manifests on those rows
(the r19 BM25 empty-token bug and the r20 phantom-token trim bug were
both of this class). This harness closes that blind spot on BOTH
sides: it PLANTS all ten driver tables full of exactly those rows,
runs EVERY gated query through graft.Verify, and replays the same
oracle SQL in DuckDB with the tools/selfcheck.py compare. Expect
"== 195 pass, 0 fail" — any FAIL is a real engine-vs-oracle semantic
drift on rows the normal gates never exercise.

Usage: python3 tools/planted_parity.py [plantedDir] [outDir]
(defaults /tmp/planted_sf /tmp/planted_out; run from the repo root)
"""
import json, os, re, subprocess, sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import selfcheck

# all ten driver tables are planted, so EVERY gated query runs
PLANTED = ["documents", "embeddings", "events", "region", "nation",
           "customer", "supplier", "part", "orders", "lineitem"]


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
    i = 0  # ids are dense from 0, like the generated testdata; the
    # corpus spans past id 300 so shard-keyed fixtures (pack_corpus
    # chains split at doc_id 300, max-shard > 2) have real work
    for rep in range(64):
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
    # ---- the blind-spot rows, PINNED at ids 30-36 so the doc_id<50
    # fixtures (streaming ingest dedup waves) exercise them too ----
    edges = [
        ("", "en", "srcedge"),
        (" \t\n  ", "en", "srcedge"),
        (None, None, "srcedge"),
        (None, "en", None),
        ("\ttab edged body with the usual fox and dog\n", "en",
         "srcedge"),
        ("\n\nleading newlines then the quick brown fox\n", "en",
         "srcedge"),
        # whitespace-padded exact dup of doc 0 (normalization collapse)
        ("  " + en + " rep0 tail0 \t\n", "en", "srcedge")]
    for off, (text, lang, source) in enumerate(edges):
        rows[30 + off] = (30 + off, text, lang, source)
    return rows


def embedding_rows():
    """Deterministic 64-dim vectors (matching the testdata dim) with
    the vector blind spots: a NULL embedding, a wrong-dim vector, an
    empty array, a ZERO-NORM vector (cosine's 0/0 corner), an exact
    duplicate pair, and a NULL label."""
    import random
    rng = random.Random(20_26)
    rows = []
    for vid in range(40):
        v = [round(rng.uniform(-1.0, 1.0), 4) for _ in range(64)]
        rows.append((vid, v, vid % 3))
    rows.append((40, rows[0][1], 1))          # exact dup of vec 0
    rows.append((41, [0.0] * 64, 0))          # zero norm
    rows.append((42, None, 0))                # NULL embedding
    rows.append((43, [1.0, 2.0, 3.0], 2))     # wrong dim
    rows.append((44, [], 0))                  # empty array
    rows.append((45, [round(rng.uniform(-1, 1), 4) for _ in range(64)],
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


def tpch_tables():
    """Deterministic tiny TPC-H star using the generated testdata's
    vocabulary (brands/segments/flags/date ranges the gated queries
    filter on), PLUS the blind-spot rows the generator never emits:
    NULL join keys, orphan foreign keys, NULL measures, NULL dates,
    NULL/empty categorical strings, and zero quantities. The real
    testdata has ZERO NULLs in any TPC-H column, so join/aggregate/
    order NULL semantics are otherwise unpinned by every gate."""
    import random
    from datetime import datetime, timedelta
    rng = random.Random(7)
    region = [(i, n) for i, n in enumerate(
        ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"])]
    nation = [(i, f"NATION_{i}", i % 5) for i in range(23)]
    nation += [(23, f"NATION_23", None),   # NULL region key
               (24, None, 2)]              # NULL name
    segs = ["MACHINERY", "HOUSEHOLD", "FURNITURE", "BUILDING",
            "AUTOMOBILE"]
    customer = [(k, f"Customer#{k}", rng.randrange(25),
                 round(rng.uniform(-999.99, 9999.99), 2),
                 segs[k % 5]) for k in range(1, 41)]
    customer += [
        (41, "Customer#41", None, 100.0, "BUILDING"),  # NULL nation
        (42, "Customer#42", 3, None, "MACHINERY"),     # NULL acctbal
        (43, "Customer#43", 4, 50.0, None),            # NULL segment
        (44, "", 5, 60.0, "HOUSEHOLD"),                # empty name
        (45, None, 6, 70.0, "FURNITURE")]              # NULL name
    supplier = [(k, f"Supplier#{k}", rng.randrange(25),
                 round(rng.uniform(-999.99, 9999.99), 2))
                for k in range(1, 11)]
    supplier += [(11, "Supplier#11", None, 10.0),
                 (12, "Supplier#12", 7, None)]
    nouns = ["bolt", "anvil", "ring", "plate", "gear", "rod"]
    sizes = ["large", "old", "new", "small"]
    types = ["ECONOMY", "LARGE", "STANDARD", "PROMO", "MEDIUM", "SMALL"]
    part = [(k, f"{sizes[k % 4]} {nouns[k % 6]}", f"Brand#{1 + k % 25}",
             types[k % 6], 1 + (k * 7) % 50,
             round(rng.uniform(100.0, 2000.0), 2))
            for k in range(1, 27)]
    part += [
        (27, "large widget", None, "PROMO", 10, 500.0),  # NULL brand
        (28, "old widget", "Brand#7", None, 20, 600.0),  # NULL type
        (29, "new widget", "Brand#21", "LARGE", None, 700.0),
        (30, "", "Brand#1", "SMALL", 5, 800.0),          # empty name
        (31, None, "Brand#2", "MEDIUM", 25, None),       # NULL name+price
        (32, "small widget", "Brand#3", "ECONOMY", 50, 900.0)]
    pris = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
            "5-LOW"]
    day0 = datetime(1992, 1, 1)
    orders = [(k, rng.randrange(1, 46),
               "OFP"[k % 3],
               round(rng.uniform(1000.0, 300000.0), 2),
               day0 + timedelta(days=rng.randrange(2400),
                                seconds=rng.randrange(86400)),
               pris[k % 5]) for k in range(1, 215)]
    orders += [
        (215, None, "O", 500.0, day0 + timedelta(days=900), "2-HIGH"),
        (216, 9999, "F", 600.0, day0 + timedelta(days=910), "5-LOW"),
        (217, 3, "O", None, day0 + timedelta(days=920), "1-URGENT"),
        (218, 4, "P", 700.0, None, "3-MEDIUM"),          # NULL date
        (219, 5, None, 800.0, day0 + timedelta(days=930), None),
        (220, 6, "O", 900.0, day0 + timedelta(days=940), "4-NOT SPECIFIED")]
    lineitem = []
    ln = 0
    for k in range(1, 221):
        for j in range(1 + (k % 7)):  # linenumbers reach 7 (the i31 fixture deletes l_linenumber = 7)
            ln += 1
            qty = float(1 + (ln * 13) % 50)
            price = round(rng.uniform(900.0, 100000.0), 2)
            lineitem.append((
                k, 1 + (ln * 11) % 32, 1 + ln % 12, j + 1, qty, price,
                round((ln % 11) * 0.01, 2), round((ln % 9) * 0.01, 2),
                "NAR"[ln % 3], "OF"[ln % 2],
                day0 + timedelta(days=(ln * 37) % 2400,
                                 seconds=(ln * 977) % 86400)))
    lineitem += [
        (1, None, 2, 90, 5.0, 100.0, 0.05, 0.01, "N", "O",
         day0 + timedelta(days=100)),                    # NULL partkey
        (2, 3, None, 90, 6.0, 200.0, 0.06, 0.02, "A", "F",
         day0 + timedelta(days=730)),                    # NULL suppkey
        (3, 4, 5, 90, None, 300.0, 0.06, 0.03, "R", "O",
         day0 + timedelta(days=740)),                    # NULL quantity
        (4, 5, 6, 90, 7.0, None, 0.05, 0.04, "N", "F",
         day0 + timedelta(days=750)),                    # NULL price
        (5, 6, 7, 90, 8.0, 400.0, None, 0.05, "A", "O",
         day0 + timedelta(days=760)),                    # NULL discount
        (6, 7, 8, 90, 9.0, 500.0, 0.07, None, "R", "F",
         day0 + timedelta(days=770)),                    # NULL tax
        (7, 8, 9, 90, 10.0, 600.0, 0.05, 0.06, None, "O",
         day0 + timedelta(days=780)),                    # NULL flag
        (8, 9, 10, 90, 11.0, 700.0, 0.06, 0.07, "N", None,
         day0 + timedelta(days=790)),                    # NULL status
        (9, 10, 11, 90, 12.0, 800.0, 0.05, 0.08, "A", "F",
         None),                                          # NULL shipdate
        (10, 11, 12, 90, 0.0, 900.0, 0.06, 0.01, "R", "O",
         day0 + timedelta(days=800)),                    # zero quantity
        (9999, 12, 1, 90, 13.0, 1000.0, 0.05, 0.02, "N", "F",
         day0 + timedelta(days=810))]                    # orphan order
    return {
        "region": ("r_regionkey INTEGER, r_name VARCHAR", region),
        "nation": ("n_nationkey INTEGER, n_name VARCHAR, "
                   "n_regionkey INTEGER", nation),
        "customer": ("c_custkey BIGINT, c_name VARCHAR, c_nationkey "
                     "INTEGER, c_acctbal DOUBLE, c_mktsegment VARCHAR",
                     customer),
        "supplier": ("s_suppkey BIGINT, s_name VARCHAR, s_nationkey "
                     "INTEGER, s_acctbal DOUBLE", supplier),
        "part": ("p_partkey BIGINT, p_name VARCHAR, p_brand VARCHAR, "
                 "p_type VARCHAR, p_size INTEGER, p_retailprice DOUBLE",
                 part),
        "orders": ("o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus "
                   "VARCHAR, o_totalprice DOUBLE, o_orderdate TIMESTAMP, "
                   "o_orderpriority VARCHAR", orders),
        "lineitem": ("l_orderkey BIGINT, l_partkey BIGINT, l_suppkey "
                     "BIGINT, l_linenumber INTEGER, l_quantity DOUBLE, "
                     "l_extendedprice DOUBLE, l_discount DOUBLE, l_tax "
                     "DOUBLE, l_returnflag VARCHAR, l_linestatus "
                     "VARCHAR, l_shipdate TIMESTAMP", lineitem),
    }


def write_planted(planted_dir):
    os.makedirs(planted_dir, exist_ok=True)
    con = duckdb.connect()
    for name, (ddl, rows) in tpch_tables().items():
        con.execute(f"CREATE TABLE {name} ({ddl})")
        ph = ", ".join(["?"] * (ddl.count(",") + 1))
        con.executemany(f"INSERT INTO {name} VALUES ({ph})", rows)
        con.execute(f"COPY {name} TO '{planted_dir}/{name}.parquet' "
                    "(FORMAT PARQUET)")
        n = con.execute(f"SELECT count(*) FROM {name}").fetchone()[0]
        print(f"planted {n} {name} rows")
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


def gated_names(oracle):
    return sorted(oracle)


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
    names = gated_names(json.load(open(subset_src))) \
        if os.path.getsize(subset_src) > 2 else []
    if not names:
        print("no gated queries found", file=sys.stderr)
        sys.exit(2)
    print(f"running {len(names)} gated queries")
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

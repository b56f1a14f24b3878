#!/usr/bin/env python3
"""Seeded hostile-input fuzz of the DuckDB-oracle gate.

parity.py checks the gates on the driver's FIXED fixtures; this sweeps
the same three-way compare (rows / schema / values) over seeded hostile
fixtures: empty / whitespace-only / unicode / control-character / very
long strings, int64-edge keys, signed zero and extreme-magnitude
numerics, and per-seed cardinality extremes (every row one group vs
every row its own group). Values stay INSIDE each gate's documented
data contract — integral-double quantities, 0.25-grid money within
DECIMAL(18,2), discounts within DECIMAL(5,2) — because the contract is
what the engine promises to agree with the oracle on; NaN money or
non-integral quantities are contract violations, not inputs.

Twenty-one gates: sixteen documents-table operators (projections,
dedup digests, the r4-reworked chunk dedup and LM scorer, and the
exact-integer corpus-assembly arithmetic — strata ceil-division,
millage weights, token-budget cumsums), q1_agg over lineitem
(money-decimal + countDistinct path), and four events gates (windowed
bars, funnel, retention, map ops) over hostile event streams. Event timestamps stay unique per user (the events contract —
window functions tie-break on event time, and engines order ties
differently) and non-negative (pre-epoch `div 1000` truncates toward
zero in Spark but EPOCH_US floors in DuckDB).

Usage: python3 scripts/fuzz_parity.py [seed ...]   (default: 1 2 3)
Exit 0 iff every gate passes at every seed.
"""
import math
import random
import shutil
import subprocess
import sys
import tempfile
from pathlib import Path

import duckdb
import pyarrow as pa
import pyarrow.dataset as pads
import pyarrow.parquet as pq

REPO = Path(__file__).resolve().parent.parent

DOC_GATES = ["dedup_exact", "dedup_normalized", "text_tokens", "text_quality",
             "text_langid", "text_fingerprint", "text_redact",
             "text_repetition", "text_hash_split",
             # r4-reworked plans + the exact-integer corpus-assembly
             # arithmetic (ceil-division strata, millage weights,
             # token-budget cumsums, boilerplate chunk counts)
             "text_chunk_dedup", "text_lm_score", "text_stratified_sample",
             "text_source_cap", "text_mix_weights", "text_shard_pack",
             "dedup_simhash"]
EVENT_GATES = ["q12_event_bars", "q27_funnel", "q20_retention", "q29_map_ops"]
GATES = DOC_GATES + ["q1_agg"] + EVENT_GATES

I64_EDGES = [0, 1, -1, 2**31, -(2**31) - 1, 2**62, -(2**62), 2**63 - 1]

TEXT_POOL = [
    "",                                   # empty document
    " ",                                  # whitespace-only
    "   ",                                # multiple spaces (empty tokens)
    "a",                                  # single 1-char token
    "a  b   c",                           # consecutive separators
    "the and is of to in it on at",       # stopword-heavy (langid=en path)
    "zzz qqq xxw vvv kkk jjj yyy",        # stopword-free (langid=unk path)
    "héllo wörld 中文 \U0001f680 مرحبا",  # unicode/RTL/emoji
    "tab\there newline\nthere quote\"backslash\\",  # control chars in tokens
    "!!! ??? ... ,,, ;;;",                # punctuation-only tokens
    "0123456789 999 3.14 -7",             # numeric tokens
    "email test@example.com ssn 123-45-6789 phone 555-123-4567",  # redact targets
    ("boiler " * 200).strip(),            # one token repeated 200x (repetition)
    ("long" + "g" * 5000 + " tail"),      # a single 5KB token
    " ".join(f"w{i}" for i in range(500)),  # 500 distinct tokens
    "\x00ul l\x00 token",             # embedded NULs
]


def gen_documents(rng, n, cardinality):
    docs = []
    for i in range(n):
        if i < len(I64_EDGES):
            doc_id = I64_EDGES[i]
        else:
            doc_id = rng.randrange(2, 2**40)  # unique with the edges above
        text = rng.choice(TEXT_POOL)
        if cardinality == "one":
            lang, source = "en", "web"      # every row one stratum
        elif cardinality == "all":
            lang, source = f"l{i}", f"s{i}"  # every row its own stratum
        else:
            lang = rng.choice(["", "en", "de", "ZZ", "中"])
            source = rng.choice(["", "web", "книга", "s"])
        n_chars = rng.choice(I64_EDGES + [len(text)])
        docs.append((doc_id, text, lang, source, n_chars))
    # doc_id must stay unique (it is the table's key)
    assert len({d[0] for d in docs}) == len(docs)
    return pa.table({
        "doc_id": pa.array([d[0] for d in docs], pa.int64()),
        "text": pa.array([d[1] for d in docs], pa.string()),
        "lang": pa.array([d[2] for d in docs], pa.string()),
        "source": pa.array([d[3] for d in docs], pa.string()),
        "n_chars": pa.array([d[4] for d in docs], pa.int64()),
    })


def gen_lineitem(rng, n, cardinality):
    # contract-legal hostile numerics: quantities are integral doubles
    # (|q| <= 1e9 so any 2k-row sum stays < 2^53, exact in any order);
    # prices sit on the 0.25 binary-exact grid within DECIMAL(18,2);
    # discounts on the 0.25 grid within DECIMAL(5,2).
    #
    # Money magnitudes are capped so every GROUP SUM's unscaled
    # decimal (sum x 10^4) stays below 2^53: this sweep found that
    # DuckDB casts DECIMAL->DOUBLE as unscaled/10^scale, which
    # double-rounds (1 ULP off) once unscaled exceeds 2^53, while
    # Spark's BigDecimal.doubleValue() rounds once, correctly. Below
    # 2^53 both are exact - that bound IS the cross-engine money
    # contract (sums to ~1e11 at scale 4), and real gate fixtures sit
    # far inside it.
    qty_pool = [0.0, -0.0, 1.0, -1.0, 7.0, 1e9, -1e9, 999999999.0]
    price_pool = [0.0, 0.25, -0.25, 1e6, -1e6, 999999.75, 0.5]
    disc_pool = [0.0, 0.25, 0.5, 0.75, 1.0, -0.25]
    if cardinality == "one":
        flags, statuses = ["A"], ["F"]
    elif cardinality == "all":
        flags = [f"f{i}" for i in range(n)]
        statuses = [f"s{i}" for i in range(n)]
    else:
        flags = ["", "A", "N", "R", "Å"]
        statuses = ["", "F", "O", "!"]
    rows = []
    for i in range(n):
        rows.append((
            rng.choice(I64_EDGES) if rng.random() < 0.1 else i,
            rng.choice(I64_EDGES) if rng.random() < 0.3 else rng.randrange(100),
            rng.randrange(10),
            i % 7,
            rng.choice(qty_pool),
            rng.choice(price_pool),
            rng.choice(disc_pool),
            0.0,
            flags[i % len(flags)],
            statuses[i % len(statuses)],
            rng.choice([0, 10**6, 820454400000, 4102444800000]),  # epoch ms
        ))
    return pa.table({
        "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
        "l_partkey": pa.array([r[1] for r in rows], pa.int64()),
        "l_suppkey": pa.array([r[2] for r in rows], pa.int64()),
        "l_linenumber": pa.array([r[3] for r in rows], pa.int32()),
        "l_quantity": pa.array([r[4] for r in rows], pa.float64()),
        "l_extendedprice": pa.array([r[5] for r in rows], pa.float64()),
        "l_discount": pa.array([r[6] for r in rows], pa.float64()),
        "l_tax": pa.array([r[7] for r in rows], pa.float64()),
        "l_returnflag": pa.array([r[8] for r in rows], pa.string()),
        "l_linestatus": pa.array([r[9] for r in rows], pa.string()),
        "l_shipdate": pa.array([r[10] for r in rows], pa.timestamp("ms")),
    })


def gen_events(rng, n, cardinality):
    # events contract: ts >= 0 (pre-epoch `ts div 1000` truncates toward
    # zero in Spark, EPOCH_US floors in DuckDB) and (user_id, ts) unique
    # (event-time window functions tie-break on ts; engines order exact
    # ties differently). Cross-user ts collisions ARE generated.
    if cardinality == "one":
        users, types = [7], ["view"]
    elif cardinality == "all":
        users = [10**6 + i for i in range(n)]
        types = [f"t{i}" for i in range(n)]
    else:
        users = [0, 1, -1, 2**62, 12345]
        types = ["", "view", "click", "purchase", "視聴"]
    val_pool = [0.0, -0.0, 0.25, -0.25, 1e6, -1e6, 999999.75]
    base_pool = [0, 3600 * 10**9, 86400 * 10**9, 2_000_000_000 * 10**9]
    props_pool = ["{}", "", '{"k": 1}', "not json", '{"a": [1, {"b": 2}]}']
    rows, used = [], set()
    for i in range(n):
        uid = users[i % len(users)]
        # hour grid spreads retention cohorts over ~n/24 days; the
        # shared grid makes DIFFERENT users collide on the same ts
        ts = rng.choice(base_pool) + (i // len(users)) * 3600 * 10**9
        while (uid, ts) in used:
            ts += 1_000  # enforce per-user uniqueness only
        used.add((uid, ts))
        rows.append((
            rng.choice(I64_EDGES) if rng.random() < 0.1 else 10**6 + i,
            ts, uid,
            rng.choice(types) if cardinality == "mixed" else types[i % len(types)],
            rng.choice(val_pool), rng.choice(props_pool)))
    return pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("ns")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
        "value": pa.array([r[4] for r in rows], pa.float64()),
        "props": pa.array([r[5] for r in rows], pa.string()),
    })


def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def values_equal(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b


def compare(out_dir, sf_dir, oracle_sql):
    con = duckdb.connect()
    for t in ["documents", "lineitem", "events"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    failures = []
    for name in GATES:
        try:
            spark_df = canon(
                pads.dataset(f"{out_dir}/{name}").to_table().to_pandas())
            duck_df = canon(con.sql(oracle_sql[name]).df())
        except Exception as e:  # noqa: BLE001 - report, don't crash the sweep
            failures.append(f"{name}: load/exec error: {e}")
            continue
        if list(spark_df.columns) != list(duck_df.columns):
            failures.append(f"{name}: columns {list(spark_df.columns)} "
                            f"vs {list(duck_df.columns)}")
        elif len(spark_df) != len(duck_df):
            failures.append(f"{name}: rows {len(spark_df)} vs {len(duck_df)}")
        else:
            for c in spark_df.columns:
                sv, dv = spark_df[c].tolist(), duck_df[c].tolist()
                bad = [(i, a, b) for i, (a, b) in enumerate(zip(sv, dv))
                       if not values_equal(a, b)]
                if bad:
                    failures.append(f"{name}: col {c} first diff {bad[0]}")
                    break
    con.close()
    return failures


def main(seeds):
    work = Path(tempfile.mkdtemp(prefix="graft_fuzz_"))
    runs = []
    for seed in seeds:
        rng = random.Random(seed)
        cardinality = ["one", "all", "mixed"][seed % 3]
        sf_dir = work / f"sf_seed{seed}"
        sf_dir.mkdir(parents=True)
        pq.write_table(gen_documents(rng, 400, cardinality),
                       sf_dir / "documents.parquet")
        pq.write_table(gen_lineitem(rng, 2000, cardinality),
                       sf_dir / "lineitem.parquet")
        pq.write_table(gen_events(rng, 3000, cardinality),
                       sf_dir / "events.parquet")
        runs.append((seed, sf_dir, work / f"out_seed{seed}"))

    # one sbt launch, one forked Verify per seed
    cmds = [f'runMain graft.Verify {sf} {out} {",".join(GATES)}'
            for _, sf, out in runs]
    subprocess.run(["sbt", "-batch"] + cmds, cwd=REPO, check=True,
                   stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)

    import json
    n_fail = 0
    for seed, sf_dir, out_dir in runs:
        oracle_sql = json.load(open(out_dir / "oracle_sql.json"))
        failures = compare(out_dir, sf_dir, oracle_sql)
        tag = ["one-group", "all-distinct", "mixed"][seed % 3]
        if failures:
            n_fail += len(failures)
            for f in failures:
                print(f"FAIL seed={seed} ({tag}) {f}")
        else:
            print(f"PASS seed={seed} ({tag}): {len(GATES)} gates")
    shutil.rmtree(work, ignore_errors=True)
    print(f"== fuzz {'FAILED' if n_fail else 'OK'}: "
          f"{len(seeds)} seeds x {len(GATES)} gates, {n_fail} failures ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    seeds = [int(a) for a in sys.argv[1:]] or [1, 2, 3]
    sys.exit(main(seeds))

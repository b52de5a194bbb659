#!/usr/bin/env python3
"""Fast data-contract canary over the raw testdata parquet.

The JVM canary (graft.Canary, run as a preflight inside Verify and
Bench) is the authoritative contract check, but it costs an sbt + Spark
startup (~30 s) — too slow to gate a sweep "fail fast" step. This is
the same contract restated over pyarrow footers (~1 s for all SFs), so
tools/sweep_oracle.sh can refuse to start three multi-minute Verify
runs against drifted testdata.

Checks per SF dir:
  - every table file present, non-empty, columns in expected order with
    expected arrow types;
  - timestamp columns may be us- or ns-encoded (Tables.repairEventsTs
    adapts to both; anything else is named as drift);
  - events.ts decodes to a plausible clock (span 1..365 days, min year
    2000..2100) — catches a rescaled clock regardless of declared unit;
  - embeddings: width exactly 64 on every row, no null vectors (the
    quantization tier s07-s14 assumes this).

Exit 0 = contract holds everywhere; exit 2 = drift (one named line per
problem, prefixed CANARY).
"""
import sys

import pyarrow.compute as pc
import pyarrow.parquet as pq

TS = ("timestamp[us]", "timestamp[ns]", "timestamp[us, tz=UTC]",
      "timestamp[ns, tz=UTC]")
EXPECTED = {
    "region": [("r_regionkey", ("int32",)), ("r_name", ("string",))],
    "nation": [("n_nationkey", ("int32",)), ("n_name", ("string",)),
               ("n_regionkey", ("int32",))],
    "customer": [("c_custkey", ("int64",)), ("c_name", ("string",)),
                 ("c_nationkey", ("int32",)), ("c_acctbal", ("double",)),
                 ("c_mktsegment", ("string",))],
    "supplier": [("s_suppkey", ("int64",)), ("s_name", ("string",)),
                 ("s_nationkey", ("int32",)), ("s_acctbal", ("double",))],
    "part": [("p_partkey", ("int64",)), ("p_name", ("string",)),
             ("p_brand", ("string",)), ("p_type", ("string",)),
             ("p_size", ("int32",)), ("p_retailprice", ("double",))],
    "orders": [("o_orderkey", ("int64",)), ("o_custkey", ("int64",)),
               ("o_orderstatus", ("string",)), ("o_totalprice", ("double",)),
               ("o_orderdate", TS), ("o_orderpriority", ("string",))],
    "lineitem": [("l_orderkey", ("int64",)), ("l_partkey", ("int64",)),
                 ("l_suppkey", ("int64",)), ("l_linenumber", ("int32",)),
                 ("l_quantity", ("double",)), ("l_extendedprice", ("double",)),
                 ("l_discount", ("double",)), ("l_tax", ("double",)),
                 ("l_returnflag", ("string",)), ("l_linestatus", ("string",)),
                 ("l_shipdate", TS)],
    "events": [("event_id", ("int64",)), ("ts", TS),
               ("user_id", ("int64",)), ("event_type", ("string",)),
               ("value", ("double",)), ("props", ("string",))],
    "documents": [("doc_id", ("int64",)), ("text", ("string",)),
                  ("lang", ("string",)), ("source", ("string",)),
                  ("n_chars", ("int64",))],
    "embeddings": [("vec_id", ("int64",)),
                   ("embedding", ("list<element: float>", "list<item: float>")),
                   ("label", ("int32",))],
}


def check_dir(d):
    problems = []
    for table, exp in EXPECTED.items():
        path = f"{d}/{table}.parquet"
        try:
            f = pq.ParquetFile(path)
        except Exception as e:
            problems.append(f"{table}: unreadable: {e}")
            continue
        if f.metadata.num_rows == 0:
            problems.append(f"{table}: table is empty")
        actual = [(fld.name, str(fld.type)) for fld in f.schema_arrow]
        for i in range(max(len(exp), len(actual))):
            if i >= len(actual):
                problems.append(f"{table}: missing column {exp[i][0]}")
            elif i >= len(exp):
                problems.append(f"{table}: unexpected extra column {actual[i][0]}")
            elif exp[i][0] != actual[i][0]:
                problems.append(f"{table}: column order/name drift — "
                                f"expected {exp[i][0]}, found {actual[i][0]}")
            elif actual[i][1] not in exp[i][1]:
                problems.append(f"{table}.{actual[i][0]}: type drift — "
                                f"expected one of {'/'.join(exp[i][1])}, "
                                f"found {actual[i][1]}")
    try:
        ts = pq.read_table(f"{d}/events.parquet", columns=["ts"])["ts"]
        lo, hi = pc.min(ts).as_py(), pc.max(ts).as_py()
        if lo is None:
            problems.append("events.ts: all null")
        else:
            span_days = (hi - lo).total_seconds() / 86400.0
            if not 1.0 <= span_days <= 365.0:
                problems.append(
                    f"events.ts: span {span_days:.2f} days outside [1, 365] "
                    "— rescaled clock?")
            if not 2000 <= lo.year <= 2100:
                problems.append(f"events.ts: min lands in year {lo.year}, "
                                "outside [2000, 2100]")
    except Exception as e:
        problems.append(f"events.ts clock check failed: {e}")
    try:
        emb = pq.read_table(f"{d}/embeddings.parquet", columns=["embedding"])
        col = emb["embedding"]
        nulls = col.null_count
        if nulls > 0:
            problems.append(f"embeddings.embedding: {nulls} null vector(s)")
        widths = pc.unique(pc.list_value_length(col.combine_chunks())).to_pylist()
        widths = sorted(w for w in widths if w is not None)
        if widths and widths != [64]:
            problems.append(
                "embeddings.embedding: width(s) "
                f"{'/'.join(map(str, widths))} != 64 — the quantization "
                "tier (s07-s14) assumes 64-d")
    except Exception as e:
        problems.append(f"embeddings check failed: {e}")
    return problems


def main():
    dirs = sys.argv[1:] or [f"/root/testdata/sf{sf}"
                            for sf in ("0.001", "0.01", "0.1")]
    bad = False
    for d in dirs:
        for p in check_dir(d):
            print(f"CANARY {d}: {p}")
            bad = True
    if bad:
        sys.exit(2)
    print(f"CANARY OK ({', '.join(dirs)})")


if __name__ == "__main__":
    main()

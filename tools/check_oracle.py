#!/usr/bin/env python3
"""Local approximation of the driver's correctness gate.

Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir>

Loads each <name>/ parquet result written by graft.Verify, runs the
matching oracle SQL from oracle_sql.json in DuckDB over the sf parquet
tables, sorts columns by name and rows by all columns, and compares
row counts, schemas (loosely), and values (with float tolerance).

Driver-side tooling only — the Scala engine never imports this.
"""
import datetime, decimal, json, math, sys, glob, os
import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

def type_mismatches(spark_schema, exp_arrow):
    """Arrow-level type strictness (r9 judge item 2): the driver's hash is
    type-sensitive, so a DuckDB HUGEINT/DECIMAL output column against a
    Spark integer column hash-fails even when every value matches (q280's
    failure mode). canon() below smooths integral floats for VALUE compare
    (the driver treats 11 == 11.0), but it must not smooth decimal128 vs
    int64 — flag that class loudly here."""
    spark_types = {f.name.lower(): f.type for f in spark_schema}
    bad = []
    for f in exp_arrow.schema:
        st = spark_types.get(f.name.lower())
        if st is None:
            continue
        if pa.types.is_decimal(f.type) and (
                pa.types.is_integer(st) or pa.types.is_floating(st)):
            bad.append(f"{f.name}: oracle {f.type} vs spark {st} "
                       f"(CAST the oracle column AS BIGINT/DOUBLE)")
        elif pa.types.is_decimal(st) and (
                pa.types.is_integer(f.type) or pa.types.is_floating(f.type)):
            bad.append(f"{f.name}: spark {st} vs oracle {f.type}")
        elif (pa.types.is_date(f.type) and pa.types.is_timestamp(st)) or \
                (pa.types.is_timestamp(f.type) and pa.types.is_date(st)):
            # canon() renders midnight timestamps and dates identically
            # (needed because the two READER paths differ) — so a real
            # date-vs-timestamp column divergence must be flagged here,
            # where the driver's type-sensitive hash would fail
            bad.append(f"{f.name}: oracle {f.type} vs spark {st} "
                       f"(align DATE vs TIMESTAMP)")
    return bad

def canon_val(v):
    if isinstance(v, decimal.Decimal):
        # arrow-path oracles surface DECIMAL as Decimal objects;
        # align their repr with the float/int canon below so
        # Decimal('11.50') matches spark's 11.5 / 11
        v = int(v) if v == v.to_integral_value() else float(v)
    if isinstance(v, datetime.datetime):
        # DATE columns surface as midnight datetime64 via the fetchdf
        # (spark-result) path but as datetime.date via the arrow
        # (oracle) path — normalize both to the ISO date so the same
        # logical date32 compares equal regardless of reader path
        if v != v:  # NaT propagates like NaN
            return "NULL"
        if v.time() == datetime.time(0, 0) and v.tzinfo is None:
            return v.date().isoformat()
        return str(v)
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            # integral floats render as ints: DuckDB HUGEINT
            # sums come back float64 via pandas, and the
            # driver's compare treats 11 == 11.0 (r5 evidence:
            # uncast sum() oracle columns hash-passed against
            # Spark longs)
            return str(int(v))
        return repr(v)
    if v is None:
        return "NULL"
    return str(v)

def canon(rows, cols):
    # EXACT float repr (shortest round-trip), no tolerance: the
    # driver hash-compares exact values, and the r5 local/driver gap
    # was this function's old 6-sig-digit smoothing hiding last-digit
    # round(double) drift. Local green must imply driver green.
    return sorted(tuple(canon_val(r[c]) for c in cols) for r in rows)

def main():
    outdir, sfdir = sys.argv[1], sys.argv[2]
    with open(os.path.join(outdir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    n_pass = n_fail = 0
    results = {}
    for name in sorted(os.listdir(outdir)):
        d = os.path.join(outdir, name)
        if not os.path.isdir(d):
            continue
        files = glob.glob(os.path.join(d, "*.parquet"))
        if not files:
            results[name] = "NO-OUTPUT (query failed in Verify?)"
            n_fail += 1
            continue
        got = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetchdf()
        if name not in oracles:
            results[name] = f"NO-ORACLE rows={len(got)}"
            continue
        try:
            exp_arrow = con.execute(oracles[name]).fetch_arrow_table()
            exp = exp_arrow.to_pandas()
        except Exception as e:
            results[name] = f"ORACLE-SQL-ERROR {e}"
            n_fail += 1
            continue
        tm = type_mismatches(pq.read_schema(files[0]), exp_arrow)
        if tm:
            results[name] = f"TYPE-MISMATCH {tm}"
            n_fail += 1
            continue
        gc, ec = sorted(got.columns), sorted(exp.columns)
        if [c.lower() for c in gc] != [c.lower() for c in ec]:
            results[name] = f"SCHEMA-MISMATCH got={gc} exp={ec}"
            n_fail += 1
            continue
        if len(got) != len(exp):
            results[name] = f"ROWCOUNT got={len(got)} exp={len(exp)}"
            n_fail += 1
            continue
        g = canon(got.to_dict("records"), gc)
        e = canon(exp.to_dict("records"), ec)
        if g == e:
            results[name] = f"PASS rows={len(got)}"
            n_pass += 1
        else:
            diffs = [(a, b) for a, b in zip(g, e) if a != b][:3]
            results[name] = f"VALUE-MISMATCH first_diffs={diffs}"
            n_fail += 1
    for k, v in results.items():
        print(f"{k:28s} {v[:300]}")
    print(f"\n{n_pass} pass, {n_fail} fail, "
          f"{len(results)-n_pass-n_fail} no-oracle")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Local mirror of the driver's t2 correctness gate (driver-side tooling,
not engine code). Runs graft.Verify's dumped parquet against each
oracle_sql.json entry executed in DuckDB over the same sf tables, then
compares row count, column names (sorted), and a value hash.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [--digest q1,q2,...]

--digest names entries compared via a 1-row ORDER-INSENSITIVE digest
computed INSIDE DuckDB on both sides (count + SUM(hash(cols sorted by
name)), HUGEINT-exact, width-insensitive across integer types —
verified: hash(5::INTEGER) = hash(5::BIGINT) = hash(5::HUGEINT)),
instead of the default python fetchall + per-cell hash. This exists for
the comparer-bound 15M–180M-row outputs (ingest/parse/unpivot class) at
the 100x gate, where the python boundary — not DuckDB and not the
engine — was the measured bottleneck (round-19 verdict task 1). The
digest drops the row-ORDER check the default path carries; every digest
entry keeps its order-sensitive full-hash row at sf0.01 and 10x.
"""
import sys, json, glob, hashlib
import duckdb

def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        # repr of float is shortest round-trip; identical doubles -> identical str
        if v != v:
            return "NaN"
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    return str(v)

def table_hash(rows, cols):
    """Sort columns by name (driver contract), keep row order, hash."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    h = hashlib.sha256()
    for r in rows:
        h.update("\x1f".join(norm_cell(r[i]) for i in order).encode())
        h.update(b"\x1e")
    return h.hexdigest()

def digest_check(con, sql, spark_files, cols):
    """Both sides reduced to ONE row inside DuckDB: exact count + an
    order-insensitive content digest (SUM over per-row 64-bit hashes of
    the name-sorted columns, accumulated in HUGEINT so the sum is
    exact). Only two scalars cross the python boundary."""
    csv = ", ".join('"%s"' % c.replace('"', '""') for c in sorted(cols))
    o_n, o_h = con.execute(
        f"SELECT COUNT(*), SUM(hash({csv})) FROM ({sql}) t").fetchone()
    s_n, s_h = con.execute(
        f"SELECT COUNT(*), SUM(hash({csv})) "
        f"FROM read_parquet({spark_files!r}) t").fetchone()
    problems = []
    if s_n != o_n:
        problems.append(f"rows spark={s_n} oracle={o_n}")
    elif s_h != o_h:
        problems.append("digest mismatch")
    return problems, s_n

def main(sf_dir, out_dir, digest_names=()):
    con = duckdb.connect()
    import os
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        # scaled corpora (e.g. /tmp/graft_sf1) store each table as a
        # DIRECTORY of part files; the driver corpus is one file per table
        path = f"{sf_dir}/{t}.parquet"
        src = f"{path}/*.parquet" if os.path.isdir(path) else path
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    import time
    for name, sql in sorted(oracle.items()):
        t0 = time.monotonic()
        spark_files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not spark_files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        digest = name in digest_names
        try:
            o_desc = con.execute(f"DESCRIBE {sql}").fetchall()
            o_cols = [r[0] for r in o_desc]
            o_types = dict(r[:2] for r in o_desc)
            o_rows = None if digest else con.execute(sql).fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); n_fail += 1; continue
        s_desc = con.execute(
            f"DESCRIBE SELECT * FROM read_parquet({spark_files!r})").fetchall()
        s_cols = [r[0] for r in s_desc]
        s_types = dict(r[:2] for r in s_desc)
        s_rows = None if digest else con.execute(
            f"SELECT * FROM read_parquet({spark_files!r})").fetchall()
        problems = []
        # Type-faithful gate: str()-hashing below masks integer-width/decimal
        # differences the driver's hash distinguishes (r5 q_join_null_safe,
        # r6 q_bpe_merges were local-green/driver-red HUGEINT oracles).
        # Driver-calibrated leniency (r6 evidence): int widths and
        # VARCHAR-vs-JSON pass the driver (pandas normalizes both), while
        # HUGEINT/DECIMAL-vs-int and float-width differences do not.
        def tclass(t):
            if t is None:
                return None
            b = t.split("(")[0]
            if b in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
                     "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"):
                return "int"
            if b in ("VARCHAR", "JSON"):
                return "str"
            return t
        for c in o_cols:
            ot, st = o_types.get(c), s_types.get(c)
            if ot in ("HUGEINT", "UHUGEINT"):
                problems.append(f"oracle col {c} is {ot} (un-CAST integer agg?)")
            elif st is not None and tclass(ot) != tclass(st):
                problems.append(f"col {c} type spark={st} oracle={ot}")
        if sorted(s_cols) != sorted(o_cols):
            problems.append(f"cols spark={sorted(s_cols)} oracle={sorted(o_cols)}")
        if digest:
            n_rows = 0
            if not problems:
                dprobs, n_rows = digest_check(con, sql, spark_files, o_cols)
                problems.extend(dprobs)
            if problems:
                print(f"FAIL {name}: " + "; ".join(problems[:3])); n_fail += 1
            else:
                # elapsed = oracle SQL + both digest scans in DuckDB — the
                # per-entry cost the gate scripts' pricing notes record
                print(f"PASS {name} ({n_rows} rows, digest, "
                      f"{time.monotonic() - t0:.0f}s)"); n_pass += 1
            continue
        if len(s_rows) != len(o_rows):
            problems.append(f"rows spark={len(s_rows)} oracle={len(o_rows)}")
        if not problems and table_hash(s_rows, s_cols) != table_hash(o_rows, o_cols):
            problems.append("hash mismatch")
            for i, (a, b) in enumerate(zip(s_rows, o_rows)):
                sa = [a[j] for j in sorted(range(len(s_cols)), key=lambda k: s_cols[k])]
                sb = [b[j] for j in sorted(range(len(o_cols)), key=lambda k: o_cols[k])]
                if [norm_cell(x) for x in sa] != [norm_cell(x) for x in sb]:
                    problems.append(f"  first diff row {i}: spark={sa} oracle={sb}")
                    break
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems[:3])); n_fail += 1
        else:
            print(f"PASS {name} ({len(s_rows)} rows)"); n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    digest = set()
    args = sys.argv[1:]
    if "--digest" in args:
        i = args.index("--digest")
        digest = set(args[i + 1].split(","))
        args = args[:i] + args[i + 2:]
    sys.exit(main(args[0], args[1], digest))

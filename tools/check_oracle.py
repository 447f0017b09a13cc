#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/<name>/ parquet (written by graft.Verify) and
<verifyOutDir>/oracle_sql.json, runs each oracle SQL in DuckDB with views
over <sfDir>/*.parquet, and compares: schema (column name set), row count,
and a hash over values with columns sorted by name.

Dev tool only — not part of the shipped library.
"""
import sys, os, json, hashlib, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(norm(x) for x in v) + "]"
    return str(v)


def table_digest(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(norm(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(p):
            # Spark-written table (graft.ScaleUp output): dir of part files
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        spark_dir = os.path.join(out_dir, name)
        if not os.path.isdir(spark_dir):
            print(f"FAIL {name}: no spark output dir")
            n_fail += 1
            continue
        try:
            sdf = con.execute(
                f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')").fetchall()
            scols = [d[0] for d in con.description]
            odf = con.execute(oracle[name]).fetchall()
            ocols = [d[0] for d in con.description]
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        problems = []
        # Driver-parity dtype check: the real gate converts both sides to
        # pandas, where DuckDB HUGEINT (int128, e.g. from SUM over ints)
        # becomes float/object and list columns become unhashable ndarrays.
        # Catch those here even though the value-compare below would pass.
        try:
            import pandas  # noqa: F401
            spd = con.execute(
                f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')").df()
            opd = con.execute(oracle[name]).df()
            for c in sorted(set(spd.columns) & set(opd.columns)):
                sk, ok = spd[c].dtype.kind, opd[c].dtype.kind
                if sk != ok:
                    problems.append(f"dtype kind mismatch on {c}: "
                                    f"spark={spd[c].dtype} oracle={opd[c].dtype}")
                if ok == "O" and len(opd) and isinstance(
                        opd[c].iloc[0], (list, tuple)) is False and \
                        type(opd[c].iloc[0]).__name__ == "ndarray":
                    problems.append(f"oracle col {c} is an array (driver sort crashes)")
                if sk == "O" and len(spd) and \
                        type(spd[c].iloc[0]).__name__ == "ndarray":
                    problems.append(f"spark col {c} is an array (driver sort crashes)")
        except ImportError:
            pass
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols spark={sorted(scols)} oracle={sorted(ocols)}")
        if len(sdf) != len(odf):
            problems.append(f"rows spark={len(sdf)} oracle={len(odf)}")
        if not problems:
            hs, ho = table_digest(scols, sdf), table_digest(ocols, odf)
            if hs != ho:
                problems.append("value hash mismatch")
                order_s = sorted(range(len(scols)), key=lambda i: scols[i])
                order_o = sorted(range(len(ocols)), key=lambda i: ocols[i])
                ls = sorted("|".join(norm(r[i]) for i in order_s) for r in sdf)
                lo = sorted("|".join(norm(r[i]) for i in order_o) for r in odf)
                for a, b in zip(ls, lo):
                    if a != b:
                        problems.append(f"  first diff:\n  spark : {a}\n  oracle: {b}")
                        break
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(sdf)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

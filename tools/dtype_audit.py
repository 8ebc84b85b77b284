"""Audit every oracle for driver-canonicalizer dtype hazards.

The driver's correctness harness canonicalizes BOTH result frames via
pandas before hashing stringified values. That makes pandas dtype the
real comparison contract, and it has a sharp edge: DuckDB widens every
integer ``sum()`` (plain or windowed) to HUGEINT, and ``fetchdf()``
coerces HUGEINT to float64 — so an uncast oracle sum prints ``"123.0"``
where Spark's non-null bigint prints ``"123"`` and the value hash flips
even though the answers are identical (this was CORRECTNESS_r03's only
red row, docs_pack_sequences). The same class covers any column whose
pandas dtype KIND (int / float / bool / object) differs between
``spark.toPandas()`` and ``duckdb.fetchdf()``.

This tool runs each catalog oracle and its Spark twin at the given sf
dir and reports every column whose pandas dtype kind differs between
the two frames. Zero output rows == no latent hazards.

Usage: python tools/dtype_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb

REPO = "/root/repo"
sys.path.insert(0, REPO)

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as ent
    from dataengineer_job_scraper_etl_spark.session import get_spark

    spark = get_spark("dtype-audit")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = ent.queries()
    oracles = ent.oracle_sql()
    hazards = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name not in oracles:
            continue
        t0 = time.time()
        try:
            spdf = fn(spark, sf_dir).toPandas()
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as e:  # noqa: BLE001 - audit keeps going
            hazards.append(name)
            print(f"ERR   {name}: {type(e).__name__}: {e}")
            continue
        skinds = {c: spdf[c].dtype.kind for c in spdf.columns}
        okinds = {c: odf[c].dtype.kind for c in odf.columns}
        bad = []
        for c in sorted(set(skinds) & set(okinds)):
            sk, ok = skinds[c], okinds[c]
            if sk == ok:
                continue
            # int-vs-float is the hash-flipping class; O (object, e.g.
            # decimals/strings) vs anything else also formats apart.
            bad.append(f"{c}: spark={sk} oracle={ok}")
        if set(skinds) != set(okinds):
            bad.append(
                f"column sets differ: spark-only={sorted(set(skinds)-set(okinds))} "
                f"oracle-only={sorted(set(okinds)-set(skinds))}"
            )
        if bad:
            hazards.append(name)
            print(f"HAZARD {name} [{time.time()-t0:.1f}s]")
            for b in bad:
                print(f"       {b}")
        else:
            print(f"ok    {name} [{time.time()-t0:.1f}s]")
    print(f"\n{len(hazards)} hazardous" + (f": {hazards}" if hazards else ""))
    return 1 if hazards else 0


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python3
"""Local approximation of the driver's t2 correctness gate.

Runs DuckDB on each oracle_sql.json entry against the sf tables and
compares with the Spark parquet dumps produced by graft.Verify.

r1 lesson: reading BOTH sides through DuckDB masked a physical-type gap
(DuckDB's pandas export turns DECIMAL into float64, pyarrow keeps
decimal.Decimal objects) — 7 queries passed here but hash-mismatched in
the driver. So now the Spark side is read with pyarrow/pandas (like the
driver) and the oracle side with DuckDB's own pandas export; dtypes must
agree after timestamp-unit normalization, and values must be exactly
equal. A DECIMAL column on either side is flagged as an error outright —
SparkEntry policy is to cast final decimals to DOUBLE on both sides.
"""
import glob
import json
import sys

import duckdb
import pandas as pd

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT_DIR = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

with open(f"{OUT_DIR}/oracle_sql.json") as f:
    oracles = json.load(f)


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    # timestamp unit normalization (ns vs us) — the only physical
    # difference the driver demonstrably tolerates (r1: q10/q13 rows ok)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def has_decimal(df: pd.DataFrame):
    import decimal
    for c in df.columns:
        if df[c].dtype == object:
            v = df[c].dropna()
            if len(v) and isinstance(v.iloc[0], decimal.Decimal):
                return c
    return None


fails, passes = [], []
for name, sql in sorted(oracles.items()):
    try:
        want = con.execute(sql).df()
        got_files = sorted(glob.glob(f"{OUT_DIR}/{name}/*.parquet"))
        if not got_files:
            fails.append((name, "no spark output"))
            continue
        got = pd.concat([pd.read_parquet(p) for p in got_files],
                        ignore_index=True)
        w, g = normalize(want), normalize(got)
        if list(w.columns) != list(g.columns):
            fails.append((name, f"columns differ: oracle={list(w.columns)} "
                                f"spark={list(g.columns)}"))
            continue
        if len(w) != len(g):
            fails.append((name, f"row count differs: oracle={len(w)} "
                                f"spark={len(g)}"))
            continue
        dc = has_decimal(w) or has_decimal(g)
        if dc:
            fails.append((name, f"DECIMAL column '{dc}' in final output — "
                                f"cast to DOUBLE on both sides"))
            continue
        bad = None
        for c in w.columns:
            wc, gc = w[c], g[c]
            if str(wc.dtype) != str(gc.dtype):
                bad = f"dtype[{c}]: oracle={wc.dtype} spark={gc.dtype}"
                break
            neq = ~((wc == gc) | (wc.isna() & gc.isna()))
            if neq.any():
                i = neq.idxmax()
                bad = (f"value[{c}] row {i}: oracle={wc[i]!r} "
                       f"spark={gc[i]!r} ({int(neq.sum())} diffs)")
                break
        if bad:
            fails.append((name, bad))
        else:
            passes.append(name)
    except Exception as e:
        fails.append((name, f"EXC: {e}"))

# queries without oracle → rows-only check
with_oracle = set(oracles)
for d in sorted(glob.glob(f"{OUT_DIR}/*/")):
    name = d.rstrip("/").split("/")[-1]
    if name in with_oracle:
        continue
    files = glob.glob(f"{d}/*.parquet")
    n = con.execute(
        f"SELECT count(*) FROM read_parquet({files!r})").fetchone()[0] \
        if files else 0
    status = "rows-only PASS" if n > 0 else "rows-only FAIL (0 rows)"
    (passes if n > 0 else fails).append(
        name if n > 0 else (name, status))
    print(f"  [{status}] {name} ({n} rows)")

# ---- TOML interop: second-parser validation -------------------------------
# TomlSpec/TomlProps prove render->parse identity with OUR codec; here the
# rendered metadata written by the lake queries (q68 TimeFly _dataset.toml,
# q40/q63 LakeManager _pydala.toml) is parsed with Python's stdlib tomllib —
# an independent implementation — and cross-checked against the JSON twin
# written alongside. "A pydala client can read our lake" then rests on a
# second parser, not on our codec agreeing with itself.
import datetime
import os
import tomllib


def _norm_toml(v):
    if isinstance(v, dict):
        return {k: _norm_toml(x) for k, x in v.items()}
    if isinstance(v, list):
        return [_norm_toml(x) for x in v]
    if isinstance(v, (datetime.datetime, datetime.date, datetime.time)):
        return str(v)
    return v


def _norm_json(v):
    if isinstance(v, dict):
        return {k: _norm_json(x) for k, x in v.items()}
    if isinstance(v, list):
        return [_norm_json(x) for x in v]
    if v is None:
        return "None"  # the rtoml-replacer convention the codec renders
    return v


toml_checked, toml_failed = 0, 0
toml_candidates = sorted(
    p for q in ("q40", "q63", "q68")
    for name in ("_dataset.toml", "_pydala.toml")
    for p in glob.glob(f"/tmp/graft_{q}_*/**/{name}", recursive=True))
for tpath in toml_candidates:
    jpath = tpath[:-len(".toml")] + ".json"
    if not os.path.exists(jpath):
        continue  # mirrors are written pairwise; no twin -> not ours
    try:
        with open(tpath, "rb") as f:
            tdoc = _norm_toml(tomllib.load(f))
        with open(jpath) as f:
            jdoc = _norm_json(json.load(f))
        if tdoc != jdoc:
            toml_failed += 1
            fails.append((tpath, f"tomllib parse differs from JSON twin: "
                                 f"toml={tdoc!r} json={jdoc!r}"))
        else:
            toml_checked += 1
    except Exception as e:
        toml_failed += 1
        fails.append((tpath, f"tomllib rejected rendered TOML: {e}"))
if "q68_toml_adopt" in oracles and toml_checked + toml_failed == 0:
    fails.append(("toml-interop",
                  "q68 ran but no rendered TOML artifacts were found to "
                  "validate (scratch dirs cleaned?)"))
print(f"  [tomllib] {toml_checked} rendered TOML file(s) validated "
      f"against their JSON twins")

print(f"\n== {len(passes)} PASS, {len(fails)} FAIL ==")
for name, why in fails:
    print(f"FAIL {name}: {why}")
sys.exit(1 if fails else 0)

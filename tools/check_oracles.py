#!/usr/bin/env python3
"""Local pre-validation of SparkEntry.oracleSql against the Spark outputs
written by graft.Verify — approximates the driver's DuckDB compare
(sort columns by name, sort rows, compare values exactly).

Usage: python3 tools/check_oracles.py <verify_out_dir> <sf_dir> [skip_csv] [timeout_sec]

skip_csv: optional comma-separated query names to skip — used by the
sf1 sweep for the deliberately brute-force all-pairs oracles
(exhaustive Jaccard / connected-components references), whose DuckDB
cost is quadratic in corpus size by design and infeasible at 50k docs.

timeout_sec: optional per-query wall limit (0 = none, the default).
Used by the big-corpus sweeps (sf10): one oracle whose DuckDB plan
explodes must time out as its own TIMEOUT row, not stall the sweep.
Runs each query in a worker process (fresh interpreter, killed on
expiry — DuckDB has no reliable in-process interrupt).
"""
import json
import multiprocessing as mp
import os
import sys

# Cap glibc malloc arenas BEFORE duckdb loads: with 32 query threads the
# per-thread arenas plus DuckDB's own buffer blocks fragment the address
# space into >65k mappings, and once vm.max_map_count (default 65530) is
# hit every further mmap fails — DuckDB reports it as "Out of Memory
# Error: failed to allocate N bytes (bad allocation)" with >100GB of RAM
# free (round-12 sf10 sweep: q_pipeline_e2e/q_search_facade died at
# ~65.5k maps). Arena capping keeps the map count bounded; hosts running
# the big sweeps should also raise the kernel limit
# (sysctl -w vm.max_map_count=1048576, the same tuning Elasticsearch
# documents).
os.environ.setdefault("MALLOC_ARENA_MAX", "2")

# Line-buffer stdout even on a pipe: the sweep harness consumes this
# output through subprocess.run, and parent-side prints (TIMEOUT/FAIL
# verdicts) sit in a block buffer until exit — any abnormal parent
# death silently loses them (observed: two sf100 chunk-oracle rows
# left NO trace in the sweep log). Reconfigure once, globally.
import sys as _sys
_sys.stdout.reconfigure(line_buffering=True)

import duckdb


def _warn_if_low_map_count():
    try:
        limit = int(open("/proc/sys/vm/max_map_count").read())
        if limit < 262144:
            print(f"WARN: vm.max_map_count={limit} is low; big-corpus "
                  "oracles can die with spurious OOM (bad allocation) — "
                  "raise it: sysctl -w vm.max_map_count=1048576",
                  file=sys.stderr)
    except OSError:
        pass

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def connect(sf_dir: str):
    con = duckdb.connect()
    # the progress bar DuckDB auto-enables on long queries writes
    # \r-updating bar fragments into our piped stdout, and a verdict
    # printed after one lands on the same physical line — the sweep's
    # line parser then never sees it. THIS was the vanished-verdict
    # mode (r12's two sf100 chunk rows, r13 batch 3): only queries long
    # enough to trigger the bar lost their verdicts.
    con.sql("SET enable_progress_bar=false")
    # spill instead of dying on big-corpus oracles; fresh connection
    # per query (below) so one OOM cannot poison the rest of the sweep
    # (observed at sf10: one exhausted pool made every later query fail
    # on kilobyte allocations)
    con.sql("SET temp_directory='/tmp/duckdb_spill'")
    # the spill budget must fit the DISK, not just a constant: with a
    # 60GB cap on a host holding only ~50GB free, a big spiller dies
    # mid-query on ENOSPC (or, worse, surfaces as a bad-allocation OOM
    # when the temp write fails) — observed round-11 when the 23GB
    # sf100 corpus shrank the free space under the old fixed cap.
    # Leave a 10GB guard for the OS and the Spark dumps being compared.
    free_gb = os.statvfs("/tmp").f_bavail * os.statvfs("/tmp").f_frsize // 2**30
    spill_gb = max(4, min(60, free_gb - 10))
    con.sql(f"SET max_temp_directory_size='{spill_gb}GB'")
    # a bounded limit makes DuckDB SPILL instead of dying: with the
    # default (80% of RAM) the sf10 pipeline-e2e oracle grew the pool
    # until an 8 KB allocation failed (round-10); capped, it spills to
    # temp_directory and completes. Size the cap to the HOST, not a
    # constant: the round-11 sf10 facade oracle carries ~50GB of
    # non-spillable state and OOMs under a fixed 48GB on a 128GB box
    # that can hold it comfortably. 16GB guard for the OS + pandas
    # result frames.
    # MemAvailable, NOT free pages: right after a Spark dump the page
    # cache holds the parquet just written, so free-page counts
    # collapse to a few GB and would floor the limit — reclaimable
    # cache is available memory for this purpose.
    meminfo = {l.split(":")[0]: int(l.split()[1])
               for l in open("/proc/meminfo") if ":" in l}
    avail_gb = meminfo["MemAvailable"] // 2**20
    # Clamp to what the host actually has — never floor ABOVE available
    # memory (a 16GB floor on a 12GB-available host reintroduces the
    # hard-OOM mode this cap exists to prevent). Warn when the result
    # is below a workable minimum instead of pretending we have more.
    mem_gb = min(100, max(4, avail_gb - 16))
    if mem_gb < 16:
        print(f"WARN: only {avail_gb}GB available; DuckDB memory_limit="
              f"{mem_gb}GB — large oracles may spill heavily or fail",
              file=sys.stderr)
    con.sql(f"SET memory_limit='{mem_gb}GB'")
    for t in TABLES:
        # driver testdata ships single files; ScaleUp corpora are
        # Spark-written directories of part files
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        # partial fixtures are legitimate (ScaleUp tablesCsv builds only
        # the tables a targeted sweep needs — disk is the sweep host's
        # binding constraint); DuckDB binds views eagerly, so register
        # what exists and warn loudly. An oracle that references an
        # unregistered table fails its own row with a missing-relation
        # error, not a silent pass.
        if not (os.path.exists(f"{sf_dir}/{t}.parquet")):
            print(f"WARN: {t}.parquet absent from {sf_dir} — not "
                  "registered; oracles referencing it will fail",
                  file=sys.stderr)
            continue
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def main(out_dir: str, sf_dir: str, skip_csv: str = "", timeout_sec: int = 0) -> int:
    _warn_if_low_map_count()
    skip = set(filter(None, skip_csv.split(",")))
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_timeout = 0
    for name, sql in sorted(oracle.items()):
        if name in skip:
            print(f"SKIP {name}")
            continue
        if timeout_sec > 0:
            rc = run_one_with_timeout(out_dir, sf_dir, name, sql, timeout_sec)
        else:
            rc = run_one(out_dir, sf_dir, name, sql)
        if rc is None:
            n_timeout += 1
        elif rc:
            n_pass += 1
        else:
            n_fail += 1
    timed_out = f", {n_timeout} timed out" if n_timeout else ""
    print(f"\n{n_pass} passed, {n_fail} failed{timed_out}")
    return 1 if n_fail else 0


def _worker(out_dir, sf_dir, name, sql, q):
    q.put(run_one(out_dir, sf_dir, name, sql))


def run_one_with_timeout(out_dir, sf_dir, name, sql, timeout_sec):
    """None = timed out (neither pass nor fail: the oracle, not the
    engine, ran out of budget); spawn ctx so the child holds no
    inherited DuckDB state."""
    ctx = mp.get_context("spawn")
    q = ctx.Queue()
    p = ctx.Process(target=_worker, args=(out_dir, sf_dir, name, sql, q))
    p.start()
    p.join(timeout_sec)
    if p.is_alive():
        p.terminate()
        p.join(10)
        if p.is_alive():
            p.kill()
            p.join()
        print(f"TIMEOUT {name} (> {timeout_sec}s in DuckDB)")
        return None
    try:
        # bounded get, NOT get_nowait: join() returning only proves the
        # child exited — the parent's queue feeder can lag the pipe by
        # a beat, and get_nowait there turns a completed PASS into a
        # spurious "worker died" FAIL (r18 self-review). 10s is far
        # beyond any feeder lag; a truly dead worker (OOM-kill) still
        # lands in the except arm.
        return q.get(timeout=10)
    except Exception:
        print(f"FAIL {name}: oracle worker died without a result")
        return False


def run_one(out_dir: str, sf_dir: str, name: str, sql: str) -> bool:
    """One query on a fresh connection, closed (and gc'd) before the
    next: a query that exhausts DuckDB's pool must not poison its
    successors — observed at sf10, where one giant oracle made every
    later kilobyte allocation fail until the process died."""
    import gc
    con = None
    try:
        con = connect(sf_dir)
        ok = compare_one(con, out_dir, name, sql)
    except Exception as e:
        print(f"FAIL {name}: {type(e).__name__}: {e}")
        ok = False
    finally:
        if con is not None:
            try:
                con.close()
            except Exception:
                pass
        gc.collect()
    return ok


def compare_one(con, out_dir: str, name: str, sql: str) -> bool:
        # read the Spark output FIRST: a restricted Verify run leaves
        # most outputs missing, and the oracle side can be expensive
        try:
            got = con.sql(f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
        except Exception as e:
            print(f"FAIL {name}: spark output missing: {e}")
            return False
        try:
            exp = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            return False
        exp = exp.reindex(sorted(exp.columns), axis=1)
        got = got.reindex(sorted(got.columns), axis=1)
        if list(exp.columns) != list(got.columns):
            print(f"FAIL {name}: columns differ: oracle={list(exp.columns)} spark={list(got.columns)}")
            return False
        if list(exp.dtypes) != list(got.dtypes):
            print(f"FAIL {name}: dtypes differ:\n  oracle={dict(exp.dtypes.astype(str))}\n  spark ={dict(got.dtypes.astype(str))}")
            return False
        exp_s = exp.sort_values(by=list(exp.columns)).reset_index(drop=True)
        got_s = got.sort_values(by=list(got.columns)).reset_index(drop=True)
        if len(exp_s) != len(got_s):
            print(f"FAIL {name}: row counts differ: oracle={len(exp_s)} spark={len(got_s)}")
            return False
        if not exp_s.equals(got_s):
            diff = (exp_s != got_s) & ~(exp_s.isna() & got_s.isna())
            bad = diff.any(axis=1)
            print(f"FAIL {name}: {bad.sum()} differing rows; first few:")
            print("  oracle:", exp_s[bad].head(3).to_dict("records"))
            print("  spark :", got_s[bad].head(3).to_dict("records"))
            return False
        print(f"PASS {name} ({len(exp_s)} rows)")
        return True


if __name__ == "__main__":
    sys.exit(main(
        sys.argv[1], sys.argv[2],
        sys.argv[3] if len(sys.argv) > 3 else "",
        int(sys.argv[4]) if len(sys.argv) > 4 else 0))

#!/usr/bin/env python3
"""Batched big-corpus oracle sweep (sf10/sf100): runs graft.Verify in
small batches so the Spark dumps never accumulate past the disk budget
(a full sf100 dump of the text-heavy rows would be tens of GB), checks
each batch with check_oracles.py under a per-oracle timeout, logs one
PASS/FAIL/TIMEOUT line per row, and deletes the batch's dumps before
the next batch.

Usage: python3 tools/sweep_big.py <sf_dir> <work_dir> [batch=6] [timeout=900] [only_csv]

only_csv: optional comma-separated row names — restricts the sweep to
those rows (used to front-load the newest rows in a long sf100 run).

The BY_DESIGN skip list is empty since round 14: the three formerly
skipped rows (q_ngram_jaccard, q_minhash_lsh, q_dedup_clusters — whose
oracles are deliberately all-pairs) now grade a replica-0 slice, so
their exhaustive references are decade-invariant. The mechanism stays
for any future genuinely unsweepable row.
"""
import json
import os
import shutil
import subprocess
import sys
import time

BY_DESIGN: list = []
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def sh(cmd, env=None, timeout=None):
    e = dict(os.environ)
    if env:
        e.update(env)
    return subprocess.run(cmd, env=e, timeout=timeout,
                          capture_output=True, text=True)


# Pre-flight host guard (VERDICT r14 #5): two of the three r14
# q_gopher_full sf100 attempts failed because OTHER processes starved
# the single-process oracle phase — concurrent sbt test JVMs squeezed
# DuckDB's once-at-start memory cap to 22 GB; a 48 GB Spark probe got
# the worker OOM-killed outright. The no-heavy-neighbors rule was
# procedural; this makes it mechanical: refuse to start a batch when
# 1-minute load or memory pressure says something heavy shares the
# box (CPU-only contention is tolerable for the single-threaded
# oracle, memory contention is fatal — hence the generous load bound
# and the tight memory one). GRAFT_SWEEP_FORCE=1 overrides, loudly.
LOAD_MAX = float(os.environ.get("GRAFT_SWEEP_LOAD_MAX", "8.0"))
AVAIL_MIN_GB = float(os.environ.get("GRAFT_SWEEP_AVAIL_MIN_GB", "64"))


def host_pressure():
    load1 = float(open("/proc/loadavg").read().split()[0])
    kv = {}
    for line in open("/proc/meminfo"):
        k, v = line.split(":")
        kv[k] = int(v.split()[0])
    avail_gb = kv["MemAvailable"] / 2**20
    return load1, avail_gb


def preflight(tag, fatal=True):
    # Load-only pressure is usually OUR OWN just-finished local[32]
    # spark phase decaying out of load_1m (a 16-batch sf10 sweep killed
    # itself twice on its own tail in r16) — wait for the decay before
    # concluding a neighbor holds the box. Memory pressure between
    # batches never self-inflicts (the JVM exited) and aborts after a
    # short grace (page-cache reclaim after a big spark phase can lag
    # a few seconds behind the exit).
    deadline = time.time() + 300
    while True:
        load1, avail_gb = host_pressure()
        ok = load1 <= LOAD_MAX and avail_gb >= AVAIL_MIN_GB
        print(f"[sweep] preflight {tag}: load_1m={load1:.1f} (max {LOAD_MAX}), "
              f"mem_avail={avail_gb:.0f}GB (min {AVAIL_MIN_GB:.0f}) -> "
              f"{'ok' if ok else 'CONTENDED'}", flush=True)
        if ok or os.environ.get("GRAFT_SWEEP_FORCE") == "1":
            return True
        if time.time() > deadline:
            break
        print("[sweep] contention — waiting 30s (load: our own spark "
              "tail decaying; mem: reclaim lag or a neighbor)", flush=True)
        time.sleep(30)
    if not fatal:
        # Only MEMORY pressure is fatal to the oracle phase: DuckDB's
        # once-at-start cap is sized from MemAvailable, so a squeezed
        # cap bakes in a spurious OOM FAIL — but CPU-only contention is
        # tolerable for the single-threaded oracle (the guard comment
        # above LOAD_MAX). A CPU-heavy neighbor outlasting the bounded
        # wait must NOT throw away the batch's whole Spark phase
        # (r18 self-review): proceed loudly instead of skipping.
        _, avail_gb = host_pressure()
        if avail_gb >= AVAIL_MIN_GB:
            print(f"[sweep] preflight {tag}: CPU-only contention "
                  f"outlasted the bounded wait but mem_avail="
                  f"{avail_gb:.0f}GB is clear — proceeding (slow is "
                  f"fine for the single-threaded oracle; a squeezed "
                  f"memory cap is not)", flush=True)
            return True
        return False
    print("[sweep] refusing to start under contention — a starved "
          "oracle records a false FAIL/TIMEOUT (r14 q_gopher_full, "
          "twice). Idle the box or set GRAFT_SWEEP_FORCE=1.",
          flush=True)
    sys.exit(3)


def main():
    sf_dir = sys.argv[1]
    work = sys.argv[2]
    batch_n = int(sys.argv[3]) if len(sys.argv) > 3 else 6
    timeout = int(sys.argv[4]) if len(sys.argv) > 4 else 900
    os.makedirs(work, exist_ok=True)
    preflight("start")
    verify_env = {"SPARK_GRAFT_CPUS": "32",
                  "SPARK_DRIVER_MEM": os.environ.get("SPARK_DRIVER_MEM", "48g"),
                  # natural-partitioned dumps: the repartition(1) funnel
                  # heap-OOM'd a 608M-row dump in the r13 sf100 sweep and
                  # cost 5 bystander rows their verdicts; check_oracles
                  # globs *.parquet so file count is immaterial
                  "GRAFT_VERIFY_NPARTS": "0"}

    # bootstrap: one cheap row dumps oracle_sql.json (the name universe)
    r = sh([f"{REPO}/tools/run_main.sh", "graft.Verify", sf_dir, work,
            "q1_agg"], env=verify_env)
    if r.returncode != 0:
        print(r.stdout[-3000:], r.stderr[-3000:])
        sys.exit(1)
    names = sorted(json.load(open(f"{work}/oracle_sql.json")))
    todo = [n for n in names if n not in BY_DESIGN]
    if len(sys.argv) > 5 and sys.argv[5]:
        only = set(sys.argv[5].split(","))
        unknown = only - set(names)
        if unknown:
            print(f"[sweep] unknown rows in only_csv: {sorted(unknown)}")
            sys.exit(2)
        # a BY_DESIGN request would pass name validation but sweep zero
        # rows and exit 0 — a silent false-green (ADVICE r13)
        by_design = only & set(BY_DESIGN)
        if by_design:
            print(f"[sweep] only_csv rows are by-design skips: {sorted(by_design)}")
            sys.exit(2)
        todo = [n for n in todo if n in only]
    if not todo:
        print("[sweep] nothing to sweep (empty todo) — refusing to exit green")
        sys.exit(2)
    print(f"[sweep] {len(todo)} rows to check ({len(BY_DESIGN)} by-design skips), "
          f"batch={batch_n}, per-oracle timeout={timeout}s", flush=True)

    results = {}
    for i in range(0, len(todo), batch_n):
        batch = todo[i:i + batch_n]
        # one pre-flight reading logged per batch: the oracle phase is
        # where memory contention kills, and a sweep runs for hours —
        # the start-of-run check alone can't see a probe launched later
        preflight(f"batch{i // batch_n + 1}")
        t0 = time.time()
        r = sh([f"{REPO}/tools/run_main.sh", "graft.Verify", sf_dir, work,
                ",".join(batch)], env=verify_env, timeout=7200)
        spark_s = time.time() - t0
        if r.returncode != 0:
            print(f"[sweep] Verify FAILED for batch {batch}:", flush=True)
            print(r.stderr[-3000:], flush=True)
        # verify logs per-query failures to stderr without failing the run
        for line in r.stderr.splitlines():
            if "[verify]" in line:
                print(f"[sweep] {line.strip()}", flush=True)
        skip = ",".join([n for n in names if n not in batch])
        # Gate the ORACLE launch on its own preflight (VERDICT r17 #5):
        # check_oracles sizes DuckDB's memory cap ONCE at start from
        # MemAvailable, so launching it while a neighbor (or our own
        # just-exited spark phase's page cache churn) squeezes memory
        # bakes in a tiny cap and turns a green row into a spurious
        # OOM FAIL (q_bigram_logprob's first sf100r attempt: 37.2 GiB
        # cap under contention, full pass on a clean run). The batch
        # preflight above can't see pressure that arrived during the
        # spark phase. Bounded wait; fallback depends on WHICH pressure
        # outlasted it (r18 self-review): CPU-only contention proceeds
        # loudly (a slow single-threaded oracle is fine; preflight
        # returns True), while memory pressure — the only kind that
        # corrupts the verdict — is a LOUD SKIP, never a mid-sweep
        # abort: skipped rows get no verdict, are reported as
        # NO-VERDICT/NO RESULT below, and fail the exit code.
        if not preflight(f"oracle{i // batch_n + 1}", fatal=False):
            print(f"[sweep] SKIPPING oracle phase for batch {batch} — "
                  f"memory still squeezed after bounded wait (DuckDB "
                  f"would bake in a tiny cap); rows stay unverified "
                  f"(re-run them)", flush=True)
            for n in batch:
                shutil.rmtree(f"{work}/{n}", ignore_errors=True)
            continue
        t1 = time.time()
        c = sh(["python3", f"{REPO}/tools/check_oracles.py", work, sf_dir,
                skip, str(timeout)])
        # keep the checker's COMPLETE raw streams: batch 3 of the r13
        # sf100 sweep lost two verdicts with rc=0 and empty stderr, and
        # without the raw stdout the loss mode was undiagnosable
        with open(f"{work}/batch{i // batch_n + 1}.stdout", "w") as f:
            f.write(c.stdout)
            f.write("\n--- stderr ---\n")
            f.write(c.stderr)
        for line in c.stdout.splitlines():
            if line.startswith(("PASS", "FAIL", "TIMEOUT")):
                print(f"[sweep] {line}", flush=True)
                # "FAIL name: <reason>" carries a colon on the name
                results[line.split()[1].rstrip(":")] = line.split()[0]
        if c.returncode not in (0, 1):
            print(f"[sweep] check_oracles rc={c.returncode}: "
                  f"{c.stderr[-2000:]}", flush=True)
        # every batch name must have a verdict — a silent hole means the
        # checker lost output (the vanished-TIMEOUT incident) and the
        # row needs a re-run, so say so loudly with the evidence
        for n in batch:
            if n not in results:
                print(f"[sweep] NO-VERDICT {n} (rc={c.returncode}; "
                      f"stderr tail: {c.stderr[-500:]!r})", flush=True)
        print(f"[sweep] batch {i // batch_n + 1}: spark {spark_s:.0f}s, "
              f"oracle {time.time() - t1:.0f}s, "
              f"disk free {shutil.disk_usage(work).free // 2**30}GB", flush=True)
        for n in batch:
            shutil.rmtree(f"{work}/{n}", ignore_errors=True)

    n_pass = sum(1 for v in results.values() if v == "PASS")
    n_fail = sum(1 for v in results.values() if v == "FAIL")
    n_to = sum(1 for v in results.values() if v == "TIMEOUT")
    missing = [n for n in todo if n not in results]
    print(f"\n[sweep] TOTAL: {n_pass} PASS, {n_fail} FAIL, {n_to} TIMEOUT, "
          f"{len(BY_DESIGN)} by-design skip", flush=True)
    if n_fail:
        print("[sweep] FAILED:", [n for n, v in results.items() if v == "FAIL"])
    if n_to:
        print("[sweep] TIMED OUT:", [n for n, v in results.items() if v == "TIMEOUT"])
    if missing:
        print("[sweep] NO RESULT:", missing)
    # strict exit: TIMEOUT and NO-VERDICT rows are unverified — automation
    # consuming the exit code must not read them as green (ADVICE r12)
    sys.exit(1 if (n_fail or n_to or missing) else 0)


if __name__ == "__main__":
    main()

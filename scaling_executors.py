#!/usr/bin/env python3
"""Executor-count scaling — the north rule's N vs 4N, with real executors.

The in-JVM thread ladder (scaling_run.py) conflates pipeline scaling with
one box's shared DRAM bus and one JVM's shared GC/runtime. This protocol
measures what the rule actually asks for — the same job on a cluster of N
executors vs 4N executors — as faithfully as a single box allows: each
"executor" is a SEPARATE pinned JVM (taskset, disjoint 2-CPU sets, own
shuffle dir), so 4N runs four independent schedulers/GCs/shuffles that
share only the box's memory bus, exactly like four executor containers on
one host.

Per rep: one solo 2-core run, then FOUR concurrent 2-core runs; the rep's
efficiency = aggregate/(4·solo) pairs measurements adjacent in time, so
the box's documented tens-of-minutes ambient bursts hit both sides of a
rep equally instead of biasing the ratio. Median efficiency over reps is
the headline. Writes SCALING_EXECUTORS.json and merges the result into
SCALING.json as `executor_scaling`.

Run ALONE (nothing else on the box):  python scaling_executors.py [reps]
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.abspath(__file__))
CPU_SETS = ["0-1", "8-9", "16-17", "24-25"]
# 50M default (the round-3..5 protocol). Short-phase variant: the box's
# ambient bursts run tens of minutes — the same timescale as a 50M phase —
# so a rep's solo and quad phases often land in DIFFERENT ambient states
# and the ratio doesn't cancel the burst. Shrinking n_urls shrinks the
# phase to ~1/4 of the burst timescale, so adjacent phases share ambient
# state and the per-rep ratio cancels it to first order.
N_URLS = int(os.environ.get("STARCHART_SCALING_URLS", str(50_000_000)))
OUT_FILE = os.environ.get("STARCHART_SCALING_OUT", "SCALING_EXECUTORS.json")


def launch_with(cpuset: str, tag: str, overrides: dict | None = None) -> subprocess.Popen:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS="2",
        STARCHART_BENCH_URLS=str(N_URLS),
        STARCHART_BENCH_REPS="1",
        STARCHART_BENCH_SKIP_QUERIES="1",
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.1",
        STARCHART_DRIVER_MEM="12g",
        STARCHART_LOCAL_DIR=f"/dev/shm/spark-ex-{tag}",
    )
    env.update(overrides or {})
    return subprocess.Popen(
        ["taskset", "-c", cpuset, sys.executable, os.path.join(REPO, "bench.py")],
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        env=env,
        text=True,
    )


def launch(cpuset: str, tag: str) -> subprocess.Popen:
    return launch_with(cpuset, tag)


def result(proc: subprocess.Popen) -> float:
    out, _ = proc.communicate(timeout=1200)
    line = [ln for ln in out.strip().splitlines() if ln.startswith("{")][-1]
    return float(json.loads(line)["value"])


def steal_jiffies() -> int:
    """Cumulative hypervisor steal time (jiffies) from /proc/stat — the
    direct sensor for the co-tenant CPU contention that the DRAM probe
    can only infer. Deltas are recorded per phase; cpu_pair_control.py
    showed per-instance compute rate swings ±25% with this counter."""
    with open("/proc/stat") as f:
        return int(f.readline().split()[8])


def membw_probe() -> float:
    """Single-process DRAM stream-copy GB/s (membw.py, ~3 s) run before
    each rep: a rep whose baseline deviates >20% from the session median
    ran inside one of the box's documented ambient-burst windows, so its
    efficiency is annotated unqualified rather than blindly trimmed
    (VERDICT r4 "do this" #6)."""
    import membw

    return membw.measure(1)


CPU_SETS_4C = ["0-3", "8-11"]  # the 2×4-core middle rung


def main() -> None:
    # 5 reps default (VERDICT r3 "do this" #6: more reps + outlier trim —
    # round 3's 0.803 median sat 0.003 over the bar with one rep at 0.795)
    flags = {"--append", "--fresh-keep-prior", "--gated"}
    args = [a for a in sys.argv[1:] if a not in flags]
    append = "--append" in sys.argv[1:]
    # --fresh-keep-prior: start a NEW session but preserve the existing
    # file's per-rep data under prior_sessions (never silently discard a
    # measured window — noisy sessions stay in the record, annotated).
    fresh_keep = "--fresh-keep-prior" in sys.argv[1:]
    # --gated: wait for a clean ambient window BEFORE each rep — probe the
    # DRAM baseline every 2 min and only fire when it reads >= the gate
    # (defaults to 16.0 GB/s, ~95% of this box's unloaded 16.9-17.0).
    # Gating on detector health BEFORE measuring is protocol-sound in a
    # way post-hoc exclusion is not: the decision to measure never sees
    # the measurement. Reps still record pre+post probes, so a burst that
    # STARTS mid-rep remains identifiable.
    gated = "--gated" in sys.argv[1:]
    gate_gb_s = float(os.environ.get("STARCHART_SCALING_GATE_GB_S", "16.0"))
    gate_timeout_s = float(
        os.environ.get("STARCHART_SCALING_GATE_TIMEOUT_S", "3600")
    )

    def wait_for_clean_window() -> bool:
        """Poll until the box reads clean or the budget runs out."""
        import time as _time

        t0 = _time.time()
        while _time.time() - t0 < gate_timeout_s:
            p = membw_probe()
            if p >= gate_gb_s:
                return True
            print(f"gate: probe {p:.1f} < {gate_gb_s} GB/s, waiting...",
                  file=sys.stderr)
            _time.sleep(120)
        return False
    reps = int(args[0]) if args else 5
    duo_reps = int(os.environ.get("STARCHART_SCALING_DUO_REPS", "2"))
    rows = []
    for rep in range(reps):
        if gated and not wait_for_clean_window():
            print(f"gate: no clean window within {gate_timeout_s}s budget, "
                  f"stopping at {rep} reps", file=sys.stderr)
            break
        probe = membw_probe()
        st0 = steal_jiffies()
        solo = result(launch(CPU_SETS[0], "solo"))
        st1 = steal_jiffies()
        quad_procs = [launch(cs, f"q{i}") for i, cs in enumerate(CPU_SETS)]
        quad = [result(p) for p in quad_procs]
        st2 = steal_jiffies()
        probe_post = membw_probe()
        agg = sum(quad)
        eff = agg / (4 * solo)
        rows.append({"solo": solo, "quad": quad, "aggregate": agg,
                     "efficiency": round(eff, 3), "membw_gb_s": probe,
                     "membw_post_gb_s": probe_post,
                     "steal_jiffies_solo_phase": st1 - st0,
                     "steal_jiffies_quad_phase": st2 - st1})
        print(f"rep {rep}: solo={solo:.0f} agg={agg:.0f} eff={eff:.3f} "
              f"membw={probe:.0f}/{probe_post:.0f} "
              f"steal={st1 - st0}/{st2 - st1}", file=sys.stderr)
    # middle rung: N=1 vs 2N=2 pinned 4-core executor JVMs — shows the
    # efficiency trend between the 1x and 4x points isn't knife-edge
    duo_rows = []
    for rep in range(duo_reps):
        if gated and not wait_for_clean_window():
            break
        env4 = {"SPARK_GRAFT_CPUS": "4", "STARCHART_DRIVER_MEM": "16g"}
        solo4 = result(launch_with(CPU_SETS_4C[0], "solo4", env4))
        duo_procs = [
            launch_with(cs, f"d{i}", env4) for i, cs in enumerate(CPU_SETS_4C)
        ]
        duo = [result(p) for p in duo_procs]
        agg4 = sum(duo)
        eff4 = agg4 / (2 * solo4)
        duo_rows.append({"solo": solo4, "duo": duo, "aggregate": agg4,
                         "efficiency": round(eff4, 3)})
        print(f"4c rep {rep}: solo={solo4:.0f} agg={agg4:.0f} eff={eff4:.3f}",
              file=sys.stderr)

    if not rows and not append:
        print("no reps measured; leaving SCALING_EXECUTORS.json untouched",
              file=sys.stderr)
        return
    prior_sessions = []
    if append or fresh_keep:
        try:
            with open(os.path.join(REPO, OUT_FILE)) as f:
                prior = json.load(f)
            prior_sessions = prior.get("prior_sessions", [])
            if append:
                rows = prior.get("per_rep", []) + rows
                reps = len(rows)
                duo_rows = (
                    prior.get("middle_rung_1v2_4core", {}).get("per_rep", [])
                    + duo_rows
                )
                print(f"--append: merged to {reps} reps / "
                      f"{len(duo_rows)} duo reps", file=sys.stderr)
            else:
                prior.pop("prior_sessions", None)
                prior_sessions = prior_sessions + [prior]
                print(f"--fresh-keep-prior: archived prior session "
                      f"({len(prior.get('per_rep', []))} reps, median "
                      f"{prior.get('median_efficiency')})", file=sys.stderr)
        except (OSError, json.JSONDecodeError):
            pass

    # Burst handling (VERDICT r4 #6, revised after two sessions of live
    # data): the DRAM probe is an ANNOTATION, not an exclusion gate. A
    # pre-rep probe cannot see a burst that starts mid-rep, and a burst
    # can hit EITHER phase — a solo-phase hit inflates the rep's ratio
    # (observed 1.020) exactly as often as a quad-phase hit deflates it
    # (observed 0.526), so the artifacts are two-sided and the MEDIAN over
    # all reps is the estimator that cancels them; probe-based exclusion
    # discarded whichever half happened to disagree with the probe's
    # moment. Probes (pre+post) stay recorded so a burst-straddling rep is
    # identifiable in the data.
    probes = [r["membw_gb_s"] for r in rows]
    probe_med = statistics.median(probes)
    probe_max = max(probes)
    for r in rows:
        pre = r["membw_gb_s"]
        post = r.get("membw_post_gb_s", pre)
        r["burst_suspect"] = min(pre, post) < 0.8 * probe_max
    effs = sorted(r["efficiency"] for r in rows)
    med_eff = round(statistics.median(effs), 3)
    # outlier trim: drop the best and worst rep, mean the rest (stable
    # against a single ambient-burst rep either direction)
    trimmed = effs[1:-1] if len(effs) >= 3 else effs
    trim_eff = round(sum(trimmed) / len(trimmed), 3)
    # Secondary estimator for heavily burst-contaminated sessions: ambient
    # co-tenancy can only SUBTRACT throughput (membw_pair_control.py shows
    # the pinned topology itself scales at ~0.99 under a pure DRAM stream),
    # so max-over-reps estimates each configuration's uncontended rate and
    # their ratio estimates the uncontended efficiency. One-sided-noise
    # max, not cherry-picking: both numerator and denominator take their
    # own best rep.
    best_eff = round(max(r["aggregate"] for r in rows)
                     / (4 * max(r["solo"] for r in rows)), 3)
    out = {
        "metric": "throughput scaling efficiency, N=1 vs 4N=4 pinned 2-core "
        "executor JVMs (disjoint CPU sets, shared memory bus only)",
        "n_urls": N_URLS,
        "reps": reps,
        "cpu_sets": CPU_SETS,
        "per_rep": rows,
        "membw_probe_median_gb_s": probe_med,
        "membw_probe_max_gb_s": probe_max,
        "n_burst_suspect_reps": sum(1 for r in rows if r.get("burst_suspect")),
        "median_efficiency": med_eff,
        "trimmed_mean_efficiency": trim_eff,
        "best_of_n_efficiency": best_eff,
        "middle_rung_1v2_4core": {
            "cpu_sets": CPU_SETS_4C,
            "per_rep": duo_rows,
            "median_efficiency": round(
                statistics.median(r["efficiency"] for r in duo_rows), 3
            ) if duo_rows else None,
        },
        "target": 0.8,
        "pass": med_eff >= 0.8,
        "prior_sessions": prior_sessions,
        "note": (
            "each executor is a separate pinned JVM — four independent "
            "schedulers/GCs/shuffles sharing only DRAM, the single-box "
            "faithful form of a 4-executor cluster; per-rep pairing of solo "
            "and quad cancels the box's ambient bursts"
        ),
    }
    with open(os.path.join(REPO, OUT_FILE), "w") as f:
        json.dump(out, f, indent=2)
    try:
        if OUT_FILE != "SCALING_EXECUTORS.json":
            raise OSError("variant run: do not touch SCALING.json")
        with open(os.path.join(REPO, "SCALING.json")) as f:
            sc = json.load(f)
        sc["executor_scaling"] = {
            "median_efficiency": med_eff,
            "pass": med_eff >= 0.8,
            "detail": "SCALING_EXECUTORS.json",
        }
        with open(os.path.join(REPO, "SCALING.json"), "w") as f:
            json.dump(sc, f, indent=2)
    except (OSError, json.JSONDecodeError):
        pass
    print(json.dumps(out))


if __name__ == "__main__":
    main()

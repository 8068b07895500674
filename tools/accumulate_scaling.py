#!/usr/bin/env python3
"""Opportunistic scaling-sample accumulator.

The north rule's two-level scaling artifact is only as good as the
host-weather window it was measured in, and this shared box spends
whole hours with every sample uniformly depressed by hypervisor
memory-bandwidth steal (BASELINE.md "host weather"). bench.py already
pools samples from a durable history keyed by the engine digest; this
tool's job is to FILL that history with clean samples by watching for
quiet windows across a long span and only spending full build samples
when a window looks clean.

How it watches: a cheap (~0.5 s) single-thread memory-bandwidth probe
— time N sum-passes over an 800 MB array. Bandwidth steal is exactly
what slows it, and the probe self-calibrates by ratcheting a rolling
minimum (persisted in .bench_history/probe.json), so no absolute
calibration is needed: "probe within PROBE_TOL of the best ever seen"
means the memory subsystem is as quiet as this host gets.

Sampling burst: a cheap wide (local[4]) sample first — its cpu_sec vs
the committed quiet baseline is the authoritative clean/stolen verdict
(same rule bench.py elects with). Only if that lands clean does the
expensive narrow (local[1]) sample run. Burst aborts the moment a
sample comes back stolen. Every sample, clean or stolen, is appended
to the same history bench.py pools, via the same scaling_one_run
measurement path (fresh subprocess, fresh JVM, /proc/stat co-tenant
metering) — nothing here measures differently from the driver's run.

Exit 0 the moment BOTH levels hold a clean corroborated best (the
driver's next bench invocation then elects a clean pair regardless of
its own window), or at the ACCUM_BUDGET_SEC deadline.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402

NARROW, WIDE = 1, 4
PROBE_TOL = float(os.environ.get("ACCUM_PROBE_TOL", "1.10"))
#: a window that just produced a STOLEN sample defines a probe level
#: that is known-dirty; "quiet" must read meaningfully below it, not
#: merely match the best-so-far (which may itself have been measured
#: inside a stolen window — the min ratchets down across hours, but
#: until a clean sample exists it proves nothing)
STOLEN_PROBE_MARGIN = float(os.environ.get("ACCUM_STOLEN_MARGIN", "0.80"))
#: guest-local busyness gate: our own test runs / builds inflate the
#: sample's cpu_sec exactly like co-tenant steal would — don't spend
#: samples while this guest is busy with something else
LOAD_GATE = float(os.environ.get("ACCUM_LOAD_GATE", "2.0"))
SLEEP_SEC = float(os.environ.get("ACCUM_SLEEP_SEC", "120"))
BUDGET_SEC = float(os.environ.get("ACCUM_BUDGET_SEC", str(4 * 3600)))
#: even in endless bad weather, take one wide sample this often — the
#: build's own cpu_sec is the authoritative window verdict and
#: recalibrates the probe's notion of "stolen" against ground truth
FORCE_SAMPLE_EVERY = float(os.environ.get("ACCUM_FORCE_EVERY", "2400"))
PROBE_STATE = os.path.join(os.path.dirname(bench.HISTORY_PATH), "probe.json")

_probe_buf = None


def mem_probe() -> float:
    """Seconds for 3 sum-passes over 800 MB — lower is quieter."""
    global _probe_buf
    import numpy as np

    if _probe_buf is None:
        _probe_buf = np.ones(100_000_000, dtype=np.float64)
    t0 = time.perf_counter()
    for _ in range(3):
        _probe_buf.sum()
    return time.perf_counter() - t0


def load_min_probe() -> float | None:
    try:
        with open(PROBE_STATE) as f:
            return float(json.load(f)["min_probe"])
    except (OSError, ValueError, KeyError):
        return None


def save_min_probe(v: float) -> None:
    os.makedirs(os.path.dirname(PROBE_STATE), exist_ok=True)
    with open(PROBE_STATE, "w") as f:
        json.dump({"min_probe": round(v, 4), "ts": int(time.time())}, f)


def level_stats(key: str) -> dict[int, dict]:
    hist = bench.load_history(key, bench.SCALING_TURNS)
    base = bench.QUIET_CPU_BASELINE.get(bench.SCALING_TURNS, {})
    return {
        n: bench.choose_level_stat(hist.get(n, []), base.get(n))
        for n in (NARROW, WIDE)
    }


def _level_ok(st: dict) -> bool:
    return st["corroborated"] and not st["window_stolen"]


def done(stats: dict[int, dict]) -> bool:
    return all(_level_ok(st) for st in stats.values())


def next_needed_level(stats: dict[int, dict]) -> int | None:
    """Which level to spend the current quiet window on: the narrow
    (expensive, ~3x the wide's wall clock) level first while it still
    lacks a clean corroborated best — quiet windows are scarce and the
    narrow samples are the ones a later noisy window cannot cheaply
    replace. None when both levels are settled."""
    return next(
        (n for n in (NARROW, WIDE) if not _level_ok(stats[n])), None
    )


def log(msg: str) -> None:
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def acquire_singleton() -> "object | None":
    """Hold an exclusive flock for the process lifetime, or None if
    another accumulator already holds it. Two concurrent accumulators
    are worse than one: each's build bursts inflate the other's
    cpu_sec exactly like co-tenant steal (the guest-load gate only
    helps when the bursts don't START simultaneously), and both then
    record the window as stolen."""
    import fcntl

    os.makedirs(os.path.dirname(PROBE_STATE), exist_ok=True)
    # open in append mode: 'w' would truncate the HOLDER's recorded
    # pid on every failed acquisition attempt, exactly when that pid
    # is needed to answer "who holds the lock?"
    f = open(os.path.join(os.path.dirname(PROBE_STATE), "accumulator.lock"), "a")
    try:
        fcntl.flock(f, fcntl.LOCK_EX | fcntl.LOCK_NB)
    except OSError:
        f.close()
        return None
    f.truncate(0)
    f.write(f"{os.getpid()}\n")
    f.flush()
    return f


def main() -> int:
    lock = acquire_singleton()
    if lock is None:
        log("another accumulator instance holds the lock; exiting")
        return 2
    key = bench._engine_digest()
    base = bench.QUIET_CPU_BASELINE.get(bench.SCALING_TURNS, {})
    staged = bench.stage_transcripts(bench.SCALING_TURNS)
    deadline = time.monotonic() + BUDGET_SEC
    min_probe = load_min_probe()
    #: min probe reading taken immediately before a sample that came
    #: back stolen — the known-dirty probe level (session-local: the
    #: host's quiet-vs-stolen probe spread is stable, its absolute
    #: level drifts)
    stolen_probe: float | None = None
    last_forced = time.monotonic()
    log(f"accumulator up: digest={key} turns={bench.SCALING_TURNS} "
        f"budget={BUDGET_SEC:.0f}s staged={staged}")

    def take(level: int) -> tuple[bool, float]:
        """One sample at `level`; append to history; -> (clean, cpu)."""
        tp, co, cpu = bench.scaling_one_run(
            level, bench.SCALING_TURNS, staged
        )
        bench.append_history(key, bench.SCALING_TURNS, level, tp, cpu, co)
        # the SAME rule election applies (bench.is_clean_sample) — the
        # burst-abort verdict and choose_level_stat can never disagree
        clean = bench.is_clean_sample(base.get(level), cpu)
        log(f"  sample local[{level}]: tp={tp:.0f} cpu={cpu:.1f}s "
            f"cotenant={co:.2f} -> {'CLEAN' if clean else 'stolen'}")
        return clean, cpu

    while time.monotonic() < deadline:
        stats = level_stats(key)
        if done(stats):
            eff = stats[WIDE]["best"] / (4.0 * stats[NARROW]["best"])
            log(f"DONE: clean corroborated pair in history, "
                f"efficiency={eff:.3f} "
                f"(narrow={stats[NARROW]['best']:.0f}, "
                f"wide={stats[WIDE]['best']:.0f})")
            return 0

        p = mem_probe()
        if min_probe is None or p < min_probe:
            min_probe = p
            save_min_probe(min_probe)
        load = os.getloadavg()[0]
        quiet_probe = (
            p <= PROBE_TOL * min_probe
            # a probe level that previously preceded a stolen verdict
            # is known-dirty: require meaningful improvement below it
            and (stolen_probe is None or p < STOLEN_PROBE_MARGIN * stolen_probe)
            # and this guest itself must be idle — our own concurrent
            # work inflates cpu_sec exactly like co-tenant steal
            and load < LOAD_GATE
        )
        # a forced sample still respects the guest-load gate: sampling
        # under our own concurrent work is wasted AND would record a
        # guest-load-dirty probe level as host-stolen
        force = (
            time.monotonic() - last_forced > FORCE_SAMPLE_EVERY
            and load < LOAD_GATE
        )
        log(f"probe={p:.3f}s (min={min_probe:.3f}, "
            f"stolen@{stolen_probe if stolen_probe else '-'}) load={load:.1f} "
            f"{'quiet' if quiet_probe else 'noisy'}"
            f"{' [forced]' if force and not quiet_probe else ''} "
            f"clean n/t: narrow={stats[NARROW]['n_clean']}/"
            f"{stats[NARROW]['n_total']} wide={stats[WIDE]['n_clean']}/"
            f"{stats[WIDE]['n_total']}")
        if not (quiet_probe or force):
            time.sleep(SLEEP_SEC)
            continue

        last_forced = time.monotonic()
        clean, failed = False, False
        try:
            # cheap wide sample first: its cpu_sec is the real verdict
            clean, _ = take(WIDE)
            while clean and time.monotonic() < deadline:
                stats = level_stats(key)
                if done(stats):
                    break
                nxt = next_needed_level(stats)
                if nxt is None:
                    break
                clean, _ = take(nxt)
        except (RuntimeError, subprocess.SubprocessError) as exc:
            # RuntimeError: the child printed no TP line (crash/OOM);
            # SubprocessError covers TimeoutExpired from the 1800s cap
            # — a severely stolen window stretching the build past it
            # is exactly the weather this tool must ride out, not die on
            log(f"  sample failed: {exc}")
            failed = True
        if not clean and not failed:
            # ANY stolen verdict in the burst (first wide probe OR a
            # mid-burst sample after the window turned) marks the probe
            # level that admitted it as known-dirty; a crashed sample
            # says nothing about the window, so it does not calibrate
            stolen_probe = round(
                min(stolen_probe, p) if stolen_probe else p, 3
            )
        # whether the burst ended clean (levels settled) or stolen, the
        # window has told us what it is — step back before re-probing
        time.sleep(SLEEP_SEC if not clean else 5)

    stats = level_stats(key)
    log(f"budget exhausted; final clean n/t: "
        f"narrow={stats[NARROW]['n_clean']}/{stats[NARROW]['n_total']} "
        f"wide={stats[WIDE]['n_clean']}/{stats[WIDE]['n_total']}")
    return 1


if __name__ == "__main__":
    sys.exit(main())

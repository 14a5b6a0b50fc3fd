"""Session-long scaling-window watcher (BASELINE.json N-vs-4N criterion).

The sandbox hypervisor's parallel CPU supply varies >5x over minutes
(BENCH/SCALING.md "Hardware reality check"); an honest 1->4 scaling
measurement needs a window where BOTH hold:

  - the 1-proc matmul burn reads healthy (>= R1_MIN/s — not the
    inverse-starved regime that spuriously inflates efficiency), and
  - the 4-proc aggregate beats 1-proc by >= 2.5x (parallel supply exists).

This watcher probes every PROBE_EVERY seconds, logs every probe, and when
a healthy window coincides with the builder being idle (no
/tmp/rcspark_busy flag — the builder sets it around pytest/bench runs so
jobs never compete for the overcommitted cores), runs the scaling pair:

  1. the 2M-URL pair (identical job to the round-1 clean-window PASS), and
  2. if that window held, the 20M-URL pair (VERDICT r3 item 3: fixed
     per-job stages amortize at 10x frontier size).

Each attempt stamps pre/post supply and appends a JSON line to
/tmp/scaling_results.jsonl; a raw efficiency >= 0.8 writes
/tmp/scaling_PASS and exits. Alongside the raw eff it reports the
supply-normalized eff = (r4/r1 speedup) / min(supply_speedup, 4) — how
much of the window's OFFERED parallelism the job converted.

Round-4 continuation finding (118 probes): the 4-proc AGGREGATE burn
never exceeded ~700/s (about 2 healthy cores' worth) while r1>=350 —
i.e. the hypervisor currently never offers 4 healthy cores at once, so
the primary gate (r1>=R1_MIN AND speedup>=2.5, jointly implying
r4>=875/s) may be unsatisfiable for the whole session. A SECONDARY
best-available gate therefore fires at r1>=SEC_R1_MIN and
speedup>=SEC_SPEEDUP_MIN (rate-limited to one attempt per
SEC_COOLDOWN_S): the pair still runs the identical 1->4 job, the raw
efficiency is reported honestly (it will read low when only ~2 cores
exist), and eff_supply_norm says how much of the OFFERED parallelism the
job converted. PASS still requires raw >= 0.8.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

BUSY_FLAG = "/tmp/rcspark_busy"
PASS_MARK = "/tmp/scaling_PASS"
RESULTS = "/tmp/scaling_results.jsonl"
LOG = "/tmp/supply_watch4.log"
PROBE_EVERY = float(os.environ.get("WATCH_PROBE_EVERY", 180))
R1_MIN = 350.0  # burst-credit floor for a believable 1-proc baseline
SPEEDUP_MIN = 2.5
# secondary best-available gate (see module docstring)
SEC_R1_MIN = float(os.environ.get("WATCH_SEC_R1_MIN", 300))
SEC_SPEEDUP_MIN = float(os.environ.get("WATCH_SEC_SPEEDUP_MIN", 2.0))
SEC_COOLDOWN_S = float(os.environ.get("WATCH_SEC_COOLDOWN_S", 2400))


def log(msg: str) -> None:
    line = f"{time.strftime('%H:%M:%S')} {msg}"
    print(line, flush=True)
    with open(LOG, "a") as f:
        f.write(line + "\n")


def probe():
    from scripts.scaling import quick_supply

    return quick_supply()


def run_pair(n_urls: int) -> dict:
    env = dict(os.environ, SCALING_N_URLS=str(n_urls))
    out = {"n_urls": n_urls}
    for cores in (1, 4):
        p = subprocess.run(
            [sys.executable, os.path.join(HERE, "scaling.py"), "--child", str(cores)],
            capture_output=True, text=True, env=env, timeout=4800,
        )
        lines = [l for l in p.stdout.splitlines() if l.startswith("{")]
        if not lines:
            out[f"r{cores}_err"] = (p.stderr or p.stdout)[-500:]
            return out
        out[f"r{cores}"] = json.loads(lines[-1])
    out["eff_raw"] = round(
        (out["r4"]["urls_per_sec"] / out["r1"]["urls_per_sec"]) / 4, 3
    )
    return out


def main() -> None:
    k = 0
    last_secondary = 0.0
    while not os.path.exists(PASS_MARK):
        k += 1
        pre = probe()
        busy = os.path.exists(BUSY_FLAG)
        log(f"probe {k}: r1={pre[0]}/s r4={pre[1]}/s speedup={pre[2]} busy={busy}")
        healthy = pre[0] >= R1_MIN and pre[2] >= SPEEDUP_MIN
        secondary = (
            not healthy
            and pre[0] >= SEC_R1_MIN
            and pre[2] >= SEC_SPEEDUP_MIN
            and time.time() - last_secondary >= SEC_COOLDOWN_S
        )
        if (healthy or secondary) and not busy:
            sizes = (2_000_000, 20_000_000) if healthy else (2_000_000,)
            if secondary:
                last_secondary = time.time()
            log(
                ("HEALTHY" if healthy else "SECONDARY (best-available)")
                + f" window — launching 1->4 pair {sizes}"
            )
            for n_urls in sizes:
                attempt = {
                    "ts": time.strftime("%H:%M:%S"),
                    "gate": "healthy" if healthy else "secondary",
                    "pre_supply": pre,
                }
                attempt.update(run_pair(n_urls))
                post = probe()
                attempt["post_supply"] = post
                if "eff_raw" in attempt:
                    offered = min(max(pre[2], post[2]), 4.0)
                    attempt["eff_supply_norm"] = round(
                        attempt["eff_raw"] * 4 / offered, 3
                    )
                with open(RESULTS, "a") as f:
                    f.write(json.dumps(attempt) + "\n")
                log(f"attempt n={n_urls}: {json.dumps(attempt)[:300]}")
                if attempt.get("eff_raw", 0) >= 0.8:
                    with open(PASS_MARK, "w") as f:
                        f.write(json.dumps(attempt))
                    log("PASS — exiting")
                    return
                # window may have moved; re-gate before the big run
                if post[2] < SPEEDUP_MIN or post[0] < R1_MIN:
                    log("window closed mid-attempt; back to probing")
                    break
                pre = post
        time.sleep(PROBE_EVERY)


if __name__ == "__main__":
    main()

"""Serial TPU measurement queue for the round-3 pending items.

Runs each stage as a bounded subprocess (SIGKILL via subprocess timeout —
safe on this host), logs to /tmp/tpu_queue/<stage>.log, re-probes the
backend between stages, and never lets one wedge sink the rest.
"""
import os, subprocess, sys, time, datetime

REPO = "/root/repo"
OUT = "/tmp/tpu_queue"
os.makedirs(OUT, exist_ok=True)
env = dict(os.environ)
env["PYTHONPATH"] = "/root/.axon_site:" + REPO

PROBE = ("import jax, jax.numpy as jnp; "
         "print('probe-ok', float(jnp.arange(64.0).sum()))")

STAGES = [
    # (name, argv, timeout_s)
    ("parity", [sys.executable, "scripts/tpu_parity_check.py"], 900),
    ("bq_pack", [sys.executable, "scripts/micro_bq_pack.py"], 900),
    ("fps_ab", [sys.executable, "scripts/micro_fps.py"], 900),
    ("floors_bench", [sys.executable, "bench.py"], 2700),
    ("bf16_bisect", [sys.executable, "scripts/micro_bf16_bisect.py",
                     "--steps", "600"], 5400),
]


def log(msg):
    stamp = datetime.datetime.now().strftime("%H:%M:%S")
    with open(os.path.join(OUT, "queue.log"), "a") as f:
        f.write(f"{stamp} {msg}\n")


def probe(timeout=300):
    try:
        r = subprocess.run([sys.executable, "-c", PROBE], env=env,
                           capture_output=True, text=True, timeout=timeout)
        return r.returncode == 0 and "probe-ok" in r.stdout
    except subprocess.TimeoutExpired:
        return False


def main():
    only = sys.argv[1:] or None
    for name, argv, tmo in STAGES:
        if only and name not in only:
            continue
        # re-probe (with a couple retries) before each expensive stage
        ok = False
        for i in range(3):
            if probe():
                ok = True
                break
            log(f"{name}: probe fail {i+1}/3, sleeping 120s")
            time.sleep(120)
        if not ok:
            log(f"{name}: SKIPPED (backend down)")
            continue
        log(f"{name}: starting ({' '.join(argv[1:])})")
        t0 = time.time()
        try:
            r = subprocess.run(argv, cwd=REPO, env=env, capture_output=True,
                               text=True, timeout=tmo)
            body = r.stdout + "\n--- stderr ---\n" + r.stderr
            status = f"rc={r.returncode}"
        except subprocess.TimeoutExpired as e:
            body = ((e.stdout or b"").decode(errors="replace")
                    if isinstance(e.stdout, bytes) else (e.stdout or ""))
            status = f"TIMEOUT {tmo}s"
        with open(os.path.join(OUT, f"{name}.log"), "w") as f:
            f.write(body)
        log(f"{name}: done {status} in {time.time()-t0:.0f}s")
    log("queue complete")


if __name__ == "__main__":
    main()

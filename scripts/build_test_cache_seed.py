#!/usr/bin/env python
"""Rebuild the checked-in compile-cache seed for the test suite.

The suite's cold-cache wall clock on a 1-vCPU host is dominated by XLA:CPU
compiles (~7.4 min of the ~12.7 min cold run, TPU_DESIGN §11).  The conftest
extracts `tests/fixtures/compile_cache_seed.tar.gz` into the persistent
compilation cache directory on first run so a fresh clone starts warm; this
script regenerates that tarball after changes that alter compiled programs
(model shapes, jit signatures, jax upgrades — stale entries are harmless
misses, but the seed stops helping until rebuilt).

Usage:
    python scripts/build_test_cache_seed.py            # full rebuild
    python scripts/build_test_cache_seed.py --no-run   # tar the current cache
"""

import argparse
import os
import shutil
import subprocess
import sys
import tarfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CACHE = os.path.join(
    os.path.expanduser("~"), ".cache", "scan2cap_tpu_jax_testcache")
SEED = os.path.join(REPO, "tests", "fixtures", "compile_cache_seed.tar.gz")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--no-run", action="store_true",
                    help="skip the suite run; tar the cache as-is")
    args = ap.parse_args()

    cache = CACHE
    if not args.no_run:
        # Build the fresh cache at a TEMP location and point the suite at it
        # via env (conftest's jax.config.update only sets a default — the
        # env var wins at jax startup in both the suite process and the CLI
        # subprocesses it spawns).  The live cache and the checked-in seed
        # survive a failed run untouched; swap in only on success.
        cache = CACHE + ".rebuild"
        shutil.rmtree(cache, ignore_errors=True)
        env = dict(os.environ,
                   JAX_COMPILATION_CACHE_DIR=cache,
                   JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS="0.35",
                   SCAN2CAP_NO_CACHE_SEED="1")  # don't re-extract old seed
        rc = subprocess.run(
            [sys.executable, "-m", "pytest", "tests/", "-q", "-x",
             "-m", "not slow"], cwd=REPO, env=env).returncode
        if rc != 0:
            sys.exit(f"suite failed (rc={rc}); not updating the seed")

    entries = sorted(os.listdir(cache)) if os.path.isdir(cache) else []
    if not entries:
        sys.exit("compilation cache is empty; nothing to seed")
    os.makedirs(os.path.dirname(SEED), exist_ok=True)
    # mtime/owner pinned so the tarball is byte-stable across rebuilds with
    # unchanged cache contents (keeps the git diff honest).  Mutate the
    # TarInfo in place: TarInfo.replace() deepcopies, and on py3.12 the
    # TarInfo carries a reference to the open TarFile's BufferedWriter,
    # which cannot be pickled.
    def _pin(ti):
        ti.mtime = 0
        ti.uid = ti.gid = 0
        ti.uname = ti.gname = ""
        return ti

    # write through an explicit GzipFile with mtime=0: tarfile's "w:gz"
    # stamps the CURRENT time into the gzip header, which alone made every
    # rebuild a spurious multi-MB git diff despite the pinned TarInfos
    import gzip

    with open(SEED, "wb") as raw:
        with gzip.GzipFile(filename="", fileobj=raw, mode="wb",
                           compresslevel=9, mtime=0) as gz:
            with tarfile.open(fileobj=gz, mode="w") as tf:
                for name in entries:
                    tf.add(os.path.join(cache, name), arcname=name,
                           filter=_pin)
    if cache != CACHE:  # success: promote the rebuilt cache to live
        shutil.rmtree(CACHE, ignore_errors=True)
        os.rename(cache, CACHE)
    print(f"seed: {len(entries)} entries, "
          f"{os.path.getsize(SEED) / 1e6:.1f} MB -> {SEED}")


if __name__ == "__main__":
    main()

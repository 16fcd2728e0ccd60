"""Regenerate the committed CPU dryrun compilation-cache entries.

The multichip dryrun (`__graft_entry__.dryrun_multichip`) compiles ~718
tiny CPU programs (~6 MB total). Those entries are committed with the repo
under .cache/xla so even a CLEAN CLONE warm-starts the dryrun (~35 s vs
124 s measured cold on this 1-core host, 2026-08-19). The multi-hundred-MB
TPU bench entries are deliberately NOT committed.

Run after any change that alters the dryrun's traced programs (trainer,
mesh shardings, tiny-config model code):

    python scripts/curate_dryrun_cache.py

It re-runs the dryrun against a fresh cache dir, replaces the committed
entry set, and prints the git command to stage it.
"""

import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CACHE = os.path.join(REPO, ".cache", "xla")


def main() -> None:
    tmp = tempfile.mkdtemp(prefix="dryrun_cache_")
    env = dict(os.environ)
    env["MD_CACHE_DIR"] = tmp
    code = ("import sys; sys.path.insert(0, %r); import __graft_entry__; "
            "__graft_entry__.dryrun_multichip(8)" % REPO)
    print(f"[curate] cold dryrun into {tmp} ...", flush=True)
    subprocess.run([sys.executable, "-c", code], env=env, cwd=REPO, check=True)

    os.makedirs(CACHE, exist_ok=True)
    # drop the previously committed set (tracked files only), then copy new
    tracked = subprocess.run(
        ["git", "ls-files", ".cache/xla"], cwd=REPO, capture_output=True,
        text=True).stdout.split()
    for rel in tracked:
        p = os.path.join(REPO, rel)
        if os.path.exists(p):
            os.remove(p)
    n = 0
    for name in os.listdir(tmp):
        shutil.copy2(os.path.join(tmp, name), os.path.join(CACHE, name))
        n += 1
    shutil.rmtree(tmp)
    print(f"[curate] copied {n} entries into {CACHE}")
    print("[curate] stage with: git add -f .cache/xla/")


if __name__ == "__main__":
    main()

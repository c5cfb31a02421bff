"""Autotune the one-hot kernel's block policy for the CURRENT toolchain.

VERDICT r4 #5: the hand table in ``ops/spconv/policy.py`` encodes sweep
results for one Mosaic toolchain; two releases in a row silently changed
the cost model and mistuned it (r3/r4 postmortems).  This tool re-runs the
isolated-conv sweep (tools/profile_conv_paths.py) on the running toolchain,
picks the fastest (bm, s, uncond) per (capacity-bucket, cin, dtype), and —
with ``--commit`` — writes them to ``ops/spconv/policy_cache.json`` keyed
by ``policy.toolchain_tag()``.  ``policy.choose_block`` prefers a cache
entry for the running toolchain; bench.py records ``policy_source`` in its
artifact, so after any toolchain bump either the cache matches (tuned) or
the artifact says 'builtin' (visibly untuned — rerun this tool).

CAVEAT (r2/r4 history): isolated-conv optima occasionally regress END TO
END (VMEM pressure from neighboring fusions).  Validate a fresh cache with
``python bench.py --no-ladder --size bench --host-rulebooks`` before
committing it; ``--revert`` deletes the running toolchain's entries.

Usage:
    python tools/autotune_policy.py --size bench            # print table
    python tools/autotune_policy.py --size bench --commit   # write cache
    python tools/autotune_policy.py --revert                # drop entries
"""

import argparse
import json
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

DEFAULT_GRID = ("256:512,256:512:u,512:512,512:768,512:768:u,"
                "512:1024,256:1024,256:512:p1,512:768:p1")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="bench", choices=["bench", "ref"])
    ap.add_argument("--configs", default=DEFAULT_GRID)
    ap.add_argument("--dtypes", default="int8,bf16")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--commit", action="store_true",
                    help="write winners into ops/spconv/policy_cache.json")
    ap.add_argument("--revert", action="store_true",
                    help="delete the running toolchain's cache entries")
    ap.add_argument("--from-json", default=None,
                    help="reuse a saved profile_conv_paths JSON instead of "
                         "sweeping")
    args = ap.parse_args()

    from q3d_tpu.ops.spconv import policy

    cache_path = ROOT / "q3d_tpu/ops/spconv/policy_cache.json"
    tag = policy.toolchain_tag()
    if args.revert:
        if cache_path.exists():
            data = json.loads(cache_path.read_text())
            if data.pop(tag, None) is not None:
                cache_path.write_text(json.dumps(data, indent=1,
                                                 sort_keys=True))
                log(f"removed cache entries for {tag}")
                return
        log(f"no cache entries for {tag}")
        return

    if args.from_json:
        results = json.loads(Path(args.from_json).read_text())
    else:
        cmd = [sys.executable, str(ROOT / "tools/profile_conv_paths.py"),
               "--size", args.size, "--iters", str(args.iters),
               "--dtypes", args.dtypes, "--no-gather",
               "--configs", args.configs]
        log("sweeping:", " ".join(cmd))
        out = subprocess.run(cmd, capture_output=True, text=True,
                             cwd=str(ROOT))
        sys.stderr.write(out.stderr[-3000:])
        if out.returncode != 0:
            log(f"sweep failed rc={out.returncode}")
            sys.exit(1)
        results = json.loads(out.stdout.strip().splitlines()[-1])

    winners = {}
    for stage_key, entry in results.items():
        dtype = "int8" if stage_key.endswith("int8") else "fp"
        n, c = entry["N"], entry["C"]
        best = None
        for k, v in entry.items():
            if not k.startswith("onehot_") or not isinstance(v, float):
                continue
            if v != v:          # NaN = failed config
                continue
            if best is None or v < best[1]:
                best = (k, v)
        if best is None:
            continue
        body = best[0][len("onehot_"):-len("_ms")]
        parts = body.split("_")
        bm = int(parts[0][2:])
        s = int(parts[1][1:])
        uncond = "u" in parts[2:]
        bucket = policy.capacity_bucket(n, c)
        key = f"{bucket}|{c}|{dtype}"
        winners[key] = [bm, s, uncond]
        log(f"{key}: N={n} best {body} = {best[1]:.3f} ms")

    print(json.dumps({tag: winners}, indent=1, sort_keys=True))
    if args.commit:
        data = json.loads(cache_path.read_text()) if cache_path.exists() \
            else {}
        data.setdefault(tag, {}).update(winners)
        cache_path.write_text(json.dumps(data, indent=1, sort_keys=True))
        log(f"committed {len(winners)} entries for {tag} -> {cache_path}")


if __name__ == "__main__":
    main()

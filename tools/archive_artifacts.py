"""Archive run artifacts with a SHA256 manifest.

The analogue of ``hotpath/scripts/archive_artifacts.py:27-89``: collects the
named files into ``GOLDENS/archives/<stamp>/`` with a ``manifest.json`` of
SHA256 digests, so benchmark/scoreboard artifacts are tamper-evident.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def sha256(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("files", nargs="+")
    parser.add_argument("--dest",
                        default=os.path.join(REPO, "GOLDENS", "archives"))
    parser.add_argument("--tag", default=None)
    args = parser.parse_args()

    stamp = args.tag or time.strftime("%Y%m%d-%H%M%S")
    out_dir = os.path.join(args.dest, stamp)
    os.makedirs(out_dir, exist_ok=True)

    manifest = {"created": time.strftime("%Y-%m-%dT%H:%M:%S"), "files": {}}
    for src in args.files:
        if not os.path.exists(src):
            print(f"warning: missing artifact {src}", file=sys.stderr)
            continue
        name = os.path.basename(src)
        dst = os.path.join(out_dir, name)
        shutil.copy2(src, dst)
        manifest["files"][name] = sha256(dst)

    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2)
    print(json.dumps({"archived": out_dir,
                      "count": len(manifest["files"])}))
    return 0


if __name__ == "__main__":
    sys.exit(main())

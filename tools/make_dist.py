"""Package the engine for ``spark-submit --py-files`` (north-rule packaging).

Builds ``dist/sparkfts.zip`` containing the ``sparkfts`` and ``oracle``
packages — the artifact shipped to every executor on a real multi-node
cluster, where the driver's local ``sys.path`` is not visible to workers:

    python tools/make_dist.py
    spark-submit --master <cluster> --py-files dist/sparkfts.zip \
        sparkfts/cli.py build --input ... --index ...

Deterministic: zip entries are sorted and timestamps pinned, so the
artifact bytes are a pure function of the source tree (repeatable deploys,
content-addressable caching).
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PACKAGES = ("sparkfts", "oracle")
PINNED_DATE = (2000, 1, 1, 0, 0, 0)


def build(out: str | None = None) -> str:
    out = out or os.path.join(REPO, "dist", "sparkfts.zip")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    entries = []
    for pkg in PACKAGES:
        root = os.path.join(REPO, pkg)
        for dirpath, dirnames, filenames in os.walk(root):
            dirnames[:] = sorted(d for d in dirnames if d != "__pycache__")
            for fn in sorted(filenames):
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    entries.append((os.path.relpath(full, REPO), full))
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for arcname, full in sorted(entries):
            with open(full, "rb") as f:
                data = f.read()
            info = zipfile.ZipInfo(arcname, date_time=PINNED_DATE)
            info.compress_type = zipfile.ZIP_DEFLATED
            info.external_attr = 0o644 << 16
            zf.writestr(info, data)
    return out


if __name__ == "__main__":
    path = build(sys.argv[1] if len(sys.argv) > 1 else None)
    print(path)

"""Package the engine for ``spark-submit --py-files``.

Writes ``dist/online_centrality_spark.zip`` containing the package
sources (importable from the archive root, as --py-files requires).
"""

from __future__ import annotations

import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def main() -> Path:
    dist = REPO / "dist"
    dist.mkdir(exist_ok=True)
    out = dist / "online_centrality_spark.zip"
    pkg = REPO / "online_centrality_spark"
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for py in sorted(pkg.rglob("*.py")):
            z.write(py, py.relative_to(REPO))
    print(out)
    return out


if __name__ == "__main__":
    main()

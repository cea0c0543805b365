#!/usr/bin/env python3
"""S10: raw-dataset fetchers — the one SURVEY §2.1 row previously left
out of engine scope, closed as a thin network-gated utility.

Mirrors the reference's per-dataset shell scripts
(``datasets/ml-100k.sh``, ``lastfm.sh``, ``ml-1m.sh``,
``book-crossing.sh``, ``steam.sh``): same public URLs, same md5 gates
where the reference pins one (``ml-100k.zip.md5``, ``ml-1m.zip.md5``),
unzip into the layout ``sources/datasets.py`` adapters read.

    python3 scripts/download_datasets.py ml-100k [--dest datasets/]

Network-dependent by nature — in an offline environment the command
fails fast with a clear message (the rest of the engine never needs
it; the adapters read whatever is on disk). The URL/checksum TABLE is
tested offline (tests/test_text_and_io.py::test_download_registry).
"""

from __future__ import annotations

import argparse
import hashlib
import os
import sys
import urllib.request
import zipfile

# (archive name, url, md5-or-None, unzip subdir-or-None)
DATASETS: dict[str, tuple[str, str, str | None, str | None]] = {
    "ml-100k": (
        "ml-100k.zip",
        "https://files.grouplens.org/datasets/movielens/ml-100k.zip",
        "0e33842e24a9c977be4e0107933c0723",  # datasets/ml-100k.zip.md5
        None,  # archive already contains ml-100k/
    ),
    "ml-1m": (
        "ml-1m.zip",
        "https://files.grouplens.org/datasets/movielens/ml-1m.zip",
        "c4d9eecfca2ab87c1945afe126590906",  # datasets/ml-1m.zip.md5
        None,
    ),
    "lastfm": (
        "hetrec2011-lastfm-2k.zip",
        "https://files.grouplens.org/datasets/hetrec2011/hetrec2011-lastfm-2k.zip",
        None,  # reference pins no checksum (lastfm.sh)
        "lastfm",
    ),
    "book-crossing": (
        "BX-CSV-Dump.zip",
        "http://www2.informatik.uni-freiburg.de/~cziegler/BX/BX-CSV-Dump.zip",
        None,
        "book-crossing",
    ),
    # steam_games.csv lives behind a Google-Drive export URL in the
    # reference (steam.sh) — single CSV, no archive
    "steam": (
        "steam/steam_games.csv",
        "https://docs.google.com/uc?export=download&id=1MVQdULBIsw5uurD1vvUaetZP9W1Vqc1M",
        None,
        None,
    ),
}


def _md5(path: str) -> str:
    h = hashlib.md5()
    with open(path, "rb") as fh:
        for chunk in iter(lambda: fh.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def fetch(name: str, dest: str = "datasets") -> str:
    fname, url, md5, subdir = DATASETS[name]
    target = os.path.join(dest, fname)
    os.makedirs(os.path.dirname(target) or ".", exist_ok=True)
    print(f"fetching {url} -> {target}", flush=True)
    try:
        urllib.request.urlretrieve(url, target)
    except OSError as e:
        raise SystemExit(
            f"network fetch failed ({e}); this utility needs internet "
            "access — the engine itself never does"
        )
    if md5 is not None:
        got = _md5(target)
        if got != md5:
            os.remove(target)
            raise SystemExit(f"checksum mismatch for {fname}: {got} != {md5}")
        print("checksum matched", flush=True)
    if fname.endswith(".zip"):
        out = os.path.join(dest, subdir) if subdir else dest
        with zipfile.ZipFile(target) as zf:
            zf.extractall(out)
        os.remove(target)
        return out
    return target


if __name__ == "__main__":
    p = argparse.ArgumentParser(description="Fetch a raw recommender dataset")
    p.add_argument("dataset", choices=sorted(DATASETS))
    p.add_argument("--dest", default="datasets")
    args = p.parse_args()
    print(fetch(args.dataset, args.dest))

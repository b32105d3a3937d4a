"""Dataset downloader: fetch datasets declared in conf/data_stores/*.yaml.

Counterpart of the reference's download.py (reference: download.py:17-77):
scans the data_stores configs for entries with ``download_link`` +
``file``, downloads, gunzips and moves into place.

Usage: python download.py nq_train [trivia_train ...]
       python download.py --list
"""
from __future__ import annotations

import argparse
import glob
import gzip
import os
import shutil
import sys
import urllib.request

import yaml

CONF_GLOB = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "conf", "data_stores", "*.yaml")


def scan_datasets():
    out = {}
    for path in sorted(glob.glob(CONF_GLOB)):
        with open(path) as f:
            cfg = yaml.safe_load(f) or {}
        for name, spec in cfg.items():
            if isinstance(spec, dict) and spec.get("download_link") and \
                    spec.get("file"):
                out[name] = spec
    return out


def download(name: str, spec: dict):
    url = spec["download_link"]
    dest = spec["file"]
    os.makedirs(os.path.dirname(dest) or ".", exist_ok=True)
    tmp = dest + (".gz" if url.endswith(".gz") else ".tmp")
    print(f"[{name}] downloading {url} -> {tmp}")
    urllib.request.urlretrieve(url, tmp)
    if url.endswith(".gz"):
        print(f"[{name}] decompressing -> {dest}")
        # decompress to a temp sibling and commit atomically: a crash
        # (or truncated archive) mid-copy must not leave a partial file
        # at the FINAL path for a later training run to silently use
        with gzip.open(tmp, "rb") as fin, open(dest + ".tmp",
                                               "wb") as fout:
            shutil.copyfileobj(fin, fout)
        os.replace(dest + ".tmp", dest)
        os.remove(tmp)
    else:
        os.replace(tmp, dest)
    print(f"[{name}] done: {dest}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("datasets", nargs="*")
    ap.add_argument("--list", action="store_true")
    args = ap.parse_args()
    available = scan_datasets()
    if args.list or not args.datasets:
        for name, spec in available.items():
            print(f"{name}: {spec['download_link']} -> {spec['file']}")
        return
    for name in args.datasets:
        if name not in available:
            print(f"unknown dataset {name!r}; use --list", file=sys.stderr)
            sys.exit(1)
        download(name, available[name])


if __name__ == "__main__":
    main()

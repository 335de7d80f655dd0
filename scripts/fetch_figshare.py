"""Fetch the OCTproZ figshare SS-OCT test dataset and record its hashes.

The reference's entire QA anchors on this recorded volume
(/root/reference/README.md:70-72 links figshare article 12356705;
performance/v100/performance_v100.md:9,101: 12-bit samples, recorded at
1664 samples per raw A-scan, 512 A-scans per B-scan, 256 B-scans; the
published benchmarks read it with "Samples per raw A-scan" set to 1024).

The build environment has zero egress, so this script cannot run here; it
ships so that a user WITH network goes from nothing to a PSNR verdict in
two commands:

    python scripts/fetch_figshare.py            # download + hash-record
    python scripts/figshare_gate.py             # process + PSNR verdict

Files land in --dir (default data/figshare, override with
OCTPROZ_FIGSHARE_DIR).  Each file's md5 is verified against the figshare
API's computed_md5, and the SHA-256 this machine computed is recorded in
figshare_meta.json so later runs (and the test gate) can detect bit-rot.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import urllib.request

ARTICLE = 12356705  # README.md:70-72
API = f"https://api.figshare.com/v2/articles/{ARTICLE}"


def _download(url: str, dest: str) -> None:
    """Chunked download with a socket timeout: a stalled connection fails
    loudly instead of hanging forever; partial files are removed so the
    next run restarts cleanly."""
    tmp = dest + ".part"
    try:
        with urllib.request.urlopen(url, timeout=120) as r, \
                open(tmp, "wb") as out:
            while True:
                chunk = r.read(1 << 22)
                if not chunk:
                    break
                out.write(chunk)
        os.replace(tmp, dest)
    except BaseException:
        try:
            os.remove(tmp)
        except OSError:
            pass
        raise


def _hash_file(path: str):
    md5, sha = hashlib.md5(), hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 22), b""):
            md5.update(chunk)
            sha.update(chunk)
    return md5.hexdigest(), sha.hexdigest()


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--dir", default=os.environ.get("OCTPROZ_FIGSHARE_DIR",
                                                   "data/figshare"))
    p.add_argument("--force", action="store_true",
                   help="re-download even if sizes match")
    args = p.parse_args()
    os.makedirs(args.dir, exist_ok=True)

    try:
        with urllib.request.urlopen(API, timeout=60) as r:
            article = json.load(r)
    except OSError as e:
        print(f"cannot reach the figshare API ({e}); this environment may "
              f"have no egress — run this script from a machine with "
              f"network access and copy {args.dir}/ over", file=sys.stderr)
        return 1

    meta = {"article": ARTICLE, "title": article.get("title"),
            "url": f"https://figshare.com/articles/{ARTICLE}", "files": []}
    for f in article.get("files", []):
        dest = os.path.join(args.dir, f["name"])
        if args.force or not os.path.exists(dest) \
                or os.path.getsize(dest) != f["size"]:
            print(f"downloading {f['name']} ({f['size'] / 1e6:.1f} MB)...",
                  file=sys.stderr)
            _download(f["download_url"], dest)
        md5, sha = _hash_file(dest)
        want = f.get("computed_md5")
        if want and md5 != want:
            raise SystemExit(f"{f['name']}: md5 {md5} != figshare's {want} "
                             f"(corrupt download; re-run with --force)")
        meta["files"].append({"name": f["name"], "size": f["size"],
                              "md5": md5, "sha256": sha})
        print(f"ok {f['name']}  md5={md5}  sha256={sha}", file=sys.stderr)

    meta_path = os.path.join(args.dir, "figshare_meta.json")
    with open(meta_path, "w") as fh:
        json.dump(meta, fh, indent=1)
    print(f"wrote {meta_path}; next: python scripts/figshare_gate.py "
          f"--dir {args.dir}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

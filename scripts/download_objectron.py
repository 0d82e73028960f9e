#!/usr/bin/env python
"""Objectron dataset downloader (network-gated).

Parity target: data/download.py (videos + annotation pbdata per category) and
src/tools/objectron_eval/download_test_video.py (records_shuffled test TFRecords).
Uses plain HTTPS against the public GCS bucket — no gsutil/TF dependency. In
zero-egress environments this script reports the URLs instead of fetching.
"""

import argparse
import os
import urllib.request

BUCKET = "https://storage.googleapis.com/objectron"
CATEGORIES = (
    "bike", "book", "bottle", "camera", "cereal_box", "chair", "cup", "laptop",
    "shoe",
)


def index_url(category: str, split: str) -> str:
    return f"{BUCKET}/v1/index/{category}_annotations_{split}"


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--category", required=True, choices=CATEGORIES)
    p.add_argument("--split", default="test", choices=("train", "test"))
    p.add_argument("--out_dir", required=True)
    p.add_argument("--records", action="store_true",
                   help="fetch eval TFRecords instead of raw videos")
    p.add_argument("--max_items", type=int, default=0)
    p.add_argument("--dry_run", action="store_true")
    args = p.parse_args()

    os.makedirs(args.out_dir, exist_ok=True)

    def fetch(url, dest):
        if args.dry_run:
            print("WOULD FETCH", url, "->", dest)
            return
        print("fetch", url)
        urllib.request.urlretrieve(url, dest)

    if args.records:
        # records_shuffled shards: objectron/v1/records_shuffled/<category>/
        #   <category>_<split>*  — shard names follow the TF naming convention.
        base = f"{BUCKET}/v1/records_shuffled/{args.category}/{args.category}_{args.split}"
        n = args.max_items or 10
        for i in range(n):
            name = f"{args.category}_{args.split}-{i:05d}-of-*"
            print("shard pattern:", f"{base}-{i:05d}-of-XXXXX (probe shard count first)")
        print("NOTE: shard count varies by category; probe with HTTP HEAD before bulk fetch.")
        return

    idx = index_url(args.category, args.split)
    try:
        listing = urllib.request.urlopen(idx).read().decode().splitlines()
    except Exception as e:
        print(f"cannot reach {idx} ({e}); this environment has no egress.")
        print("Fetch the index + per-video files on a connected machine:")
        print(f"  {idx}")
        print(f"  {BUCKET}/videos/<entry>/video.MOV")
        print(f"  {BUCKET}/videos/<entry>/geometry.pbdata")
        print(f"  {BUCKET}/annotations/<entry>.pbdata")
        return

    if args.max_items:
        listing = listing[: args.max_items]
    for entry in listing:
        safe = entry.replace("/", "_")
        fetch(f"{BUCKET}/videos/{entry}/video.MOV",
              os.path.join(args.out_dir, safe + ".MOV"))
        fetch(f"{BUCKET}/annotations/{entry}.pbdata",
              os.path.join(args.out_dir, safe + ".pbdata"))


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Aggregate per-shard raw evaluation stats into a global confidence-ranked report.

Parity target: src/tools/objectron_eval/group_report_new.py — per-video evaluator
shards dump raw (hit, confidence) records (Evaluator.save_stats); this driver
re-accumulates them and recomputes AP globally (confidence ranking must happen over
the union, not per shard).
"""

import argparse
import glob


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--stats", required=True, help="glob of shard stats json files")
    p.add_argument("--c", dest="category", default="shoe")
    p.add_argument("--report_file", default="")
    args = p.parse_args()

    from centerpose_tpu.config import preset
    from centerpose_tpu.evaluation.evaluator import Evaluator

    cfg = preset("centerpose", category=args.category)
    ev = Evaluator(cfg)
    files = sorted(glob.glob(args.stats))
    if not files:
        raise SystemExit(f"no stats files match {args.stats}")
    for f in files:
        ev.load_and_merge(f)
    report = ev.report()
    print(report)
    if args.report_file:
        with open(args.report_file, "w") as fh:
            fh.write(report + "\n")


if __name__ == "__main__":
    main()

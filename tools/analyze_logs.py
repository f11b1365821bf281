#!/usr/bin/env python
"""Training-log analysis (ref: tools/analyze_logs.py (plot_curve,
cal_train_time)) over the runner's JSON-lines log."""

import argparse
import json
import sys
from collections import defaultdict


def load_logs(path):
    records = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                records.append(json.loads(line))
    return records


def cal_train_time(records):
    times = [r["time"] for r in records if r.get("mode") == "train" and "time" in r]
    if not times:
        print("no train iterations logged")
        return
    import statistics
    print(f"iters: {len(times)}")
    print(f"mean iter time: {statistics.mean(times):.4f} s")
    print(f"fastest: {min(times):.4f} s  slowest: {max(times):.4f} s")
    if len(times) > 1:
        print(f"stddev: {statistics.stdev(times):.4f} s")


def plot_curve(records, keys, out=None):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    series = defaultdict(lambda: ([], []))
    for r in records:
        if r.get("mode") != "train":
            continue
        step = r.get("step", len(series[keys[0]][0]))
        for k in keys:
            if k in r:
                series[k][0].append(step)
                series[k][1].append(r[k])
    for k in keys:
        xs, ys = series[k]
        plt.plot(xs, ys, label=k)
    plt.xlabel("step")
    plt.legend()
    if out:
        plt.savefig(out)
        print(f"saved {out}")
    else:
        plt.show()


def main():
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="task", required=True)
    pt = sub.add_parser("cal_train_time")
    pt.add_argument("json_log")
    pp = sub.add_parser("plot_curve")
    pp.add_argument("json_log")
    pp.add_argument("--keys", nargs="+", default=["loss"])
    pp.add_argument("--out", default=None)
    args = p.parse_args()
    records = load_logs(args.json_log)
    if args.task == "cal_train_time":
        cal_train_time(records)
    else:
        plot_curve(records, args.keys, args.out)


if __name__ == "__main__":
    main()

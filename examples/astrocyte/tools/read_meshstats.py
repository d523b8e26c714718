#!/usr/bin/env python3
"""Read emimesh meshstatistic.yml volume/surface summaries (equivalent of
the reference's local_astrocyte_depolarization/read_meshstats.py)."""

import argparse
import sys


def read_meshstats(path):
    import yaml

    with open(path) as f:
        stats = yaml.safe_load(f)
    out = {}
    for key in ("volumes", "surfaces", "cells", "labels"):
        if key in stats:
            out[key] = stats[key]
    return stats if not out else out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("yml", help="emimesh meshstatistic.yml")
    args = ap.parse_args()
    stats = read_meshstats(args.yml)
    for k, v in stats.items():
        print(f"{k}: {v}")


if __name__ == "__main__":
    main()

"""Timer log aggregation (reference cli/stat.py:8-60)."""
from __future__ import annotations

import re
import sys
from collections import defaultdict
from typing import Dict, Tuple


def parse_log_file(filename: str) -> Tuple[Dict[str, float], Dict[str, int]]:
    """Parse a timer log and return per-category total times (ms) and
    counts. Matches the reference log format 'Rank N <name> took X ms'."""
    category_times: Dict[str, float] = defaultdict(float)
    category_counts: Dict[str, int] = defaultdict(int)
    pattern = r"Rank \d+ (.*?) took ([\d.]+)\s*ms"
    with open(filename) as f:
        for line in f:
            if "TIMER" not in line:
                continue
            timer_info = line.split("|")[-1].strip()
            match = re.search(pattern, timer_info)
            if match:
                category_times[match.group(1)] += float(match.group(2))
                category_counts[match.group(1)] += 1
    return dict(category_times), dict(category_counts)


def calculate_percentages(category_times, category_counts):
    total = sum(category_times.values())
    pct = {}
    avg = {}
    for cat, t in category_times.items():
        pct[cat] = 100.0 * t / total if total > 0 else 0.0
        n = category_counts[cat]
        avg[cat] = t / n if n else 0.0
    return pct, avg, total


def print_stats(filename: str, out=sys.stdout):
    times, counts = parse_log_file(filename)
    if not times:
        print("No TIMER entries found.", file=out)
        return
    pct, avg, total = calculate_percentages(times, counts)
    print(f"{'Category':<45} {'Total(ms)':>12} {'Count':>8} "
          f"{'Avg(ms)':>10} {'%':>7}", file=out)
    for cat in sorted(times, key=times.get, reverse=True):
        print(f"{cat:<45} {times[cat]:>12.2f} {counts[cat]:>8} "
              f"{avg[cat]:>10.3f} {pct[cat]:>6.1f}%", file=out)
    print(f"{'TOTAL':<45} {total:>12.2f}", file=out)

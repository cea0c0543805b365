"""Experiment reporters — S7/S8 of SURVEY §2.1, A6 aggregation.

Reproduces the reference's wide one-row-per-model CSV
(``framework/reporter/report.py:14-63``): for k-fold runs the columns
are ``fold-{i}_{metric}`` per fold plus ``{metric}_mean`` /
``{metric}_std`` (POPULATION std — np.std ddof=0, report.py:48); a
single hold-out run emits just the metric columns.

The result table is tiny (models x metrics) — the aggregation happens
in Spark upstream; writing is a driver-side CSV, exactly like the
reference's ``df.to_csv``.
"""

from __future__ import annotations

import csv
import math
import os
import platform


def _mean_std(values: list[float]) -> tuple[float, float]:
    n = len(values)
    mean = sum(values) / n
    var = sum((v - mean) ** 2 for v in values) / n  # population (ddof=0)
    return mean, math.sqrt(var)


def _ensure_dir(path: str) -> None:
    folder = os.path.dirname(path)
    if folder and not os.path.isdir(folder):
        os.makedirs(folder)


def report(results: dict[str, list[list[float]]], metric_names: list[str],
           output_file: str) -> dict[str, dict[str, float]]:
    """``results``: model -> per-fold list of metric values (aligned
    with ``metric_names``). Writes the wide CSV; returns the row dict
    (handy for tests)."""
    processed: dict[str, dict[str, float]] = {}
    for model, folds in results.items():
        row: dict[str, float] = {}
        if len(folds) > 1:
            for fold_i, fold_metrics in enumerate(folds):
                for m_i, value in enumerate(fold_metrics):
                    row[f"fold-{fold_i + 1}_{metric_names[m_i]}"] = value
            for m_i, name in enumerate(metric_names):
                mean, std = _mean_std([f[m_i] for f in folds])
                row[f"{name}_mean"] = mean
                row[f"{name}_std"] = std
        else:
            for m_i, value in enumerate(folds[0]):
                row[metric_names[m_i]] = value
        processed[model] = row

    _ensure_dir(output_file)
    cols: list[str] = []
    for row in processed.values():
        for c in row:
            if c not in cols:
                cols.append(c)
    with open(output_file, "w", newline="") as fh:
        w = csv.writer(fh)
        w.writerow(["model"] + cols)
        for model, row in processed.items():
            w.writerow([model] + [row.get(c, "") for c in cols])
    return processed


def report_execution_times(times: dict[str, list[float]], output_file: str) -> None:
    """S8 (report.py:65-101): per-model wall-clock per fold + mean/std;
    the row key embeds the host spec (CPU / RAM). GPU probing libs are
    not assumed — platform info only."""
    spec = f"{platform.processor() or platform.machine()} / {os.cpu_count()} cpus"
    _ensure_dir(output_file)
    n_folds = max((len(v) for v in times.values()), default=0)
    cols = [f"fold-{i + 1}_time_s" for i in range(n_folds)] + ["time_mean", "time_std"]
    with open(output_file, "w", newline="") as fh:
        w = csv.writer(fh)
        w.writerow(["model (host)"] + cols)
        for model, folds in times.items():
            mean, std = _mean_std(folds)
            w.writerow(
                [f"{model} ({spec})"]
                + list(folds)
                + [""] * (n_folds - len(folds))
                + [mean, std]
            )

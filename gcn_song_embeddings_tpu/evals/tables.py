"""Results tables (reference eval.py:413-467)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from gcn_song_embeddings_tpu.evals import metrics as M


def compute_results_table(knn_dict, test_positives: np.ndarray,
                          in_degrees: np.ndarray, times: bool = True,
                          degree_thr: int = 1) -> pd.DataFrame:
    """Accuracy table: hr@{10,100,500}, mrr@1000, low-degree / low-co mrr,
    optional train/emb/knn times (reference compute_results_table,
    eval.py:413-443)."""
    k_levels = [10, 100, 500]
    results = {}
    for model in knn_dict:
        _, knn_mat = knn_dict[model]
        row = {}
        for k in k_levels:
            row[f"hr (k={k})"] = M.hit_rate(knn_mat, test_positives, k)
        row["mrr"] = M.mrr(knn_mat, test_positives, 1000)
        row["low-degree accuracy"] = M.low_degree_accuracy(
            knn_mat, in_degrees, test_positives, 1000, degree_thr, M.mrr)
        row["low-co accuracy"] = M.low_co_accuracy(
            knn_mat, test_positives, 1000, 1, M.mrr)
        if times and hasattr(knn_dict, "get_times"):
            tt, et, kt = knn_dict.get_times(model)
            row["t (train)"] = tt
            row["t (emb)"] = et
            row["t (knn)"] = kt
        results[model] = row
    return pd.DataFrame.from_dict(results, orient="index")


def compute_beyond_accuracy_table(knn_dict, test_positives: np.ndarray,
                                  in_degrees: np.ndarray,
                                  features: np.ndarray) -> pd.DataFrame:
    """Beyond-accuracy table at k=100: intra/inter diversity, coverage,
    average degree (reference compute_beyond_accuracy_table,
    eval.py:445-467)."""
    k = 100
    results = {}
    for model in knn_dict:
        _, knn_mat = knn_dict[model]
        results[model] = {
            "intra diversity": M.intra_diversity(
                knn_mat, test_positives, k, features),
            "inter diversity": M.inter_diversity(
                knn_mat, test_positives, k),
            "coverage": M.coverage(knn_mat, test_positives, K=100),
            "average degree": M.average_degree(
                knn_mat, in_degrees, test_positives, k),
        }
    return pd.DataFrame.from_dict(results, orient="index")

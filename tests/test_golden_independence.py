"""Golden-independence lint (round-5 discipline lock): the iterative-op
goldens were upgraded from kernel replays to independent formulations
(VERDICT r4 directive 1); this test pins that state — golden.py must
NEVER import the engine kernels it is supposed to verify, so a future
edit cannot silently regress an oracle back to replaying the code
under test.

Constants (iteration counts, fixed-point scales, thresholds) remain
importable: they are the op's SPEC, not its implementation.
"""

import ast
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# engine kernels whose golden must stay independent (or spec-recoded
# with a build-time cross-check — either way, never imported)
FORBIDDEN = {
    "_logit_partial",       # logistic_newton  -> float64 IRLS golden
    "_qr_partial",          # quantile_regression -> inline quantized + cross-check
    "_gmm_partial",         # gmm_em -> float64 EM golden
    "_als_user_solve",      # als_factorization -> inline + cross-check
    "_tsp_tour",            # tsp_tours -> independent NN+2-opt + Held-Karp
    "_tsp_dist_fp",         # tsp distance matrix re-derived inline
    "_kleinberg_states",    # kleinberg_bursts -> backward Viterbi
    "_sax_words",           # sax_motifs -> prefix-sum PAA + searchsorted
    "_scan_cylinders",      # scan_statistic -> sliding-window scan
    "huffman_tree_lengths", # huffman -> two-queue construction
    "cca_from_sums",        # cca_analysis -> SVD-whitened solve
    "_acf_pacf_from_series",# pacf_durbin -> Toeplitz Yule-Walker solves
    "_granger_fit",         # granger_causality -> lstsq on the lag design
    "_ta_paths_for_source", # traffic_assignment -> Bellman-Ford + pred walk
}


def test_golden_never_imports_the_kernels_it_verifies():
    src = open(os.path.join(REPO, "plasmap_ray", "golden.py"), encoding="utf-8").read()
    tree = ast.parse(src)
    bad = []
    for node in ast.walk(tree):
        if isinstance(node, ast.ImportFrom):
            for alias in node.names:
                if alias.name in FORBIDDEN:
                    bad.append(f"line {node.lineno}: from {node.module} import {alias.name}")
        elif isinstance(node, ast.Attribute) and node.attr in FORBIDDEN:
            bad.append(f"line {node.lineno}: attribute access {node.attr}")
    assert not bad, "golden.py re-imports engine kernels it must verify independently:\n" + "\n".join(bad)

"""Hyperparameter evolution (iqc_tpu/train/evolve.py).

The reference declares the evolution block (yolo_config.yaml:121-127) but
delegates the capability to Ultralytics. These tests pin the native
(1+lambda)-ES: bounded mutation, monotone best fitness, seeded
determinism, and artifact export — with an analytic fitness so no
training runs on CPU (the default fitness is a short YOLOTrainer run).
"""

import json

import numpy as np

from iqc_tpu.train.evolve import SEARCH_SPACE, evolve_hyperparameters, mutate


def _quadratic_fitness(cfg):
    """Analytic fitness peaking at lr=0.02, box_gain=5.0."""
    lr_term = -((np.log10(cfg["learning_rate"]) - np.log10(0.02)) ** 2)
    box_term = -((cfg["box_gain"] - 5.0) / 5.0) ** 2
    return float(lr_term + box_term)


def test_mutation_respects_bounds_and_moves_interior_genes():
    rng = np.random.default_rng(0)
    # lower-edge genes may clip back in place; bounds must hold regardless
    edge = {k: lo for k, (lo, hi) in SEARCH_SPACE.items()}
    for _ in range(50):
        child = mutate(edge, rng, mutation_probability=0.8, sigma=0.5)
        for k, v in child.items():
            lo, hi = SEARCH_SPACE[k]
            assert lo <= v <= hi, (k, v)
    # interior genes: mutation actually moves values
    mid = {k: (lo + hi) / 2 for k, (lo, hi) in SEARCH_SPACE.items()}
    child = mutate(mid, np.random.default_rng(2), 0.8, 0.3)
    assert any(child[k] != mid[k] for k in mid)
    # zero-probability mutation still mutates exactly one interior gene
    child = mutate(mid, np.random.default_rng(1), 0.0, 0.3)
    assert sum(child[k] != mid[k] for k in mid) == 1


def test_evolution_improves_analytic_fitness(tmp_path):
    base = {"learning_rate": 0.0005, "box_gain": 0.5, "image_size": 64}
    result = evolve_hyperparameters(
        base, generations=12, population_size=6, sigma=0.4,
        fitness_fn=_quadratic_fitness, seed=3, out_dir=str(tmp_path),
    )
    f0 = result["history"][0]["fitness"]
    assert result["best_fitness"] > f0 + 0.5  # real progress, not noise
    # best-so-far is monotone
    bests = [h.get("best_fitness", h["fitness"]) for h in result["history"]]
    assert all(b >= a for a, b in zip(bests, bests[1:]))
    # moves toward the analytic optimum
    assert 0.004 < result["best_config"]["learning_rate"] < 0.08
    # non-gene config keys pass through untouched
    assert result["best_config"]["image_size"] == 64
    # artifact written
    saved = json.loads((tmp_path / "evolution.json").read_text())
    assert saved["best_fitness"] == result["best_fitness"]
    assert len(saved["history"]) == 13


def test_evolution_is_seed_deterministic():
    base = {"learning_rate": 0.001, "box_gain": 2.0}
    a = evolve_hyperparameters(base, generations=4, population_size=3,
                               fitness_fn=_quadratic_fitness, seed=11)
    b = evolve_hyperparameters(base, generations=4, population_size=3,
                               fitness_fn=_quadratic_fitness, seed=11)
    assert a["best_config"] == b["best_config"]
    assert a["best_fitness"] == b["best_fitness"]

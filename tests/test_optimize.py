"""algo.or.solve metaheuristic solvers (reference operator.rs:6617-6766,
problem shape :1732-1793).

The solvers are stochastic, so tests assert convergence structure —
monotone-ish history, constraint satisfaction, known-optimum proximity
on a tiny analytic problem — rather than exact values.  Seeded rng
makes every run deterministic.
"""

from __future__ import annotations

import numpy as np
import pytest

from samyama_graph_spark.algorithms.optimize import (
    ORProblem,
    ParetoResult,
    solve,
    solve_nsga2,
)

# minimize 2a + 5b + 1c with sum(x) >= 6, x in [0, 10]:
# optimum loads everything on the cheapest variable c -> fitness ~ 6.
_COSTS = np.array([2.0, 5.0, 1.0])


def _problem():
    return ORProblem(costs=_COSTS.copy(), lower=0.0, upper=10.0, min_total=6.0)


@pytest.mark.parametrize(
    "algorithm", ["Jaya", "Rao1", "Rao2", "Rao3", "TLBO", "GA", "SA"]
)
def test_single_objective_converges(algorithm):
    res = solve(_problem(), algorithm, pop=40, iters=300, seed=7)
    x = res.best_variables
    assert (x >= -1e-9).all() and (x <= 10 + 1e-9).all()
    assert x.sum() >= 5.5  # min_total respected (within penalty slack)
    # near the analytic optimum (6.0); SA/GA are the loosest
    assert res.best_fitness < 9.0
    # history is the running best -> non-increasing within tolerance
    h = res.history
    assert len(h) == 300
    assert h[-1] <= h[0] + 1e-9


def test_budget_constraint():
    p = ORProblem(
        costs=np.array([1.0, 1.0]), lower=0.0, upper=10.0,
        budget=4.0, min_total=3.0,
    )
    res = solve(p, "Jaya", pop=30, iters=200, seed=3)
    total_cost = res.best_variables @ p.costs
    assert total_cost <= 4.5  # quadratic penalty keeps it near budget
    assert res.best_variables.sum() >= 2.5


def test_deterministic_under_seed():
    r1 = solve(_problem(), "Jaya", pop=20, iters=50, seed=11)
    r2 = solve(_problem(), "Jaya", pop=20, iters=50, seed=11)
    assert r1.best_fitness == r2.best_fitness
    assert (r1.best_variables == r2.best_variables).all()


def test_unknown_algorithm_defaults_to_jaya():
    # reference dispatch: unknown single-objective name -> Jaya
    a = solve(_problem(), "NoSuchThing", pop=20, iters=50, seed=5)
    b = solve(_problem(), "Jaya", pop=20, iters=50, seed=5)
    assert a.best_fitness == b.best_fitness


def test_nsga2_front_tradeoff():
    # two conflicting objectives: minimize x and minimize (4 - x)
    # -> the whole [0, 4] segment is Pareto-optimal
    p = ORProblem(
        costs=np.array([1.0]),
        lower=0.0,
        upper=4.0,
        multi_costs=np.array([[1.0], [-1.0]]),
    )
    # second objective -x + const shaping via multi_costs [-1] (min -x
    # == max x) conflicts with min x
    res = solve_nsga2(p, pop=30, iters=60, seed=13)
    assert isinstance(res, ParetoResult)
    assert len(res.front_variables) > 5  # a spread front, not one point
    # every front member is non-dominated: sorted by obj0, obj1 must
    # decrease
    order = np.argsort(res.front_fitness[:, 0])
    o1 = res.front_fitness[order, 1]
    assert (np.diff(o1) <= 1e-9).all()


def test_or_solve_cypher_surface(spark):
    from samyama_graph_spark.cypher import CypherEngine
    from samyama_graph_spark.graph import PropertyGraph

    items = spark.createDataFrame(
        [(1, 2.0), (2, 5.0), (3, 1.0)], "id long, cost double"
    )
    g = PropertyGraph(spark, {"Item": items}, {}, {})
    eng = CypherEngine(g)
    got = eng.query(
        "CALL algo.or.solve({algorithm: 'Jaya', label: 'Item', "
        "property: 'alloc', cost_property: 'cost', min: 0.0, max: 10.0, "
        "min_total: 6.0, population_size: 30, max_iterations: 200, "
        "seed: 7}) YIELD fitness, algorithm, iterations"
    ).collect()
    assert len(got) == 1
    assert got[0]["algorithm"] == "Jaya"
    assert got[0]["iterations"] == 200
    assert got[0]["fitness"] < 9.0
    # solution written back onto the label's nodes
    allocs = {
        r["id"]: r["alloc"]
        for r in eng.query(
            "MATCH (i:Item) RETURN i.id AS id, i.alloc AS alloc"
        ).collect()
    }
    assert set(allocs) == {1, 2, 3}
    assert all(0.0 <= v <= 10.0 for v in allocs.values())
    assert sum(allocs.values()) >= 5.5

"""Metaheuristic optimization solvers backing ``CALL algo.or.solve``.

Reference surface: src/query/executor/operator.rs:6617-6766 (config
map -> solver over a graph-derived problem) with the problem shape at
operator.rs:1732-1793: minimize ``sum(x_i * cost_i)`` over one decision
variable per node of a label, box bounds [min, max], a quadratic
penalty for exceeding ``budget`` and a 100x-weighted quadratic penalty
for falling short of ``min_total``; the solution is written back to a
node property and a summary record (fitness, algorithm, iterations,
history) is returned.

The solvers are implemented from the published formulations — Jaya
(R.V. Rao 2016), Rao-1/2/3 (R.V. Rao 2020), TLBO (Rao, Savsani &
Vakharia 2011), real-coded GA, and simulated annealing — vectorized
over numpy: every population update is O(pop x dim) array arithmetic.
Like the reference (which collects the label's nodes into driver
vectors), the solve itself is driver-side; the graph side — cost
gathering and solution write-back — stays DataFrame-native.  Practical
bound: dim = node count of the label (guarded below, like maxFlow).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

MAX_DIM = 2_000_000  # driver-side vectors: 16MB/array at this size


@dataclass
class ORProblem:
    """minimize sum(x * costs) + penalties, x in [lower, upper]^dim."""

    costs: np.ndarray  # (dim,) single-objective coefficients
    lower: float
    upper: float
    budget: float | None = None
    min_total: float | None = None
    multi_costs: np.ndarray | None = None  # (n_obj, dim) for NSGA-II

    @property
    def dim(self) -> int:
        return len(self.costs)

    def penalty(self, X: np.ndarray) -> np.ndarray:
        """Quadratic constraint penalties (operator.rs:1769-1793)."""
        pen = np.zeros(len(X))
        if self.budget is not None:
            over = np.maximum(X @ self.costs - self.budget, 0.0)
            pen += over**2
        if self.min_total is not None:
            under = np.maximum(self.min_total - X.sum(axis=1), 0.0)
            pen += under**2 * 100.0
        return pen

    def fitness(self, X: np.ndarray) -> np.ndarray:
        return X @ self.costs + self.penalty(X)

    def objectives(self, X: np.ndarray) -> np.ndarray:
        """(pop, n_obj) objective matrix for multi-objective solvers;
        the constraint penalty is added to every objective."""
        assert self.multi_costs is not None
        pen = self.penalty(X)
        return X @ self.multi_costs.T + pen[:, None]

    def clip(self, X: np.ndarray) -> np.ndarray:
        return np.clip(X, self.lower, self.upper)

    def init_population(self, pop: int, rng: np.random.Generator) -> np.ndarray:
        return rng.uniform(self.lower, self.upper, size=(pop, self.dim))


@dataclass
class ORResult:
    best_variables: np.ndarray
    best_fitness: float
    history: list[float]


def _greedy(problem, X, fit, Xn):
    """Evaluate candidates, keep the better row (Jaya/Rao/TLBO rule)."""
    Xn = problem.clip(Xn)
    fn = problem.fitness(Xn)
    better = fn < fit
    X[better] = Xn[better]
    fit[better] = fn[better]
    return X, fit


def _iterate(problem, pop, iters, rng, step):
    X = problem.init_population(pop, rng)
    fit = problem.fitness(X)
    history = []
    for _ in range(iters):
        X, fit = step(X, fit, rng)
        history.append(float(fit.min()))
    i = int(fit.argmin())
    return ORResult(X[i], float(fit[i]), history)


# ------------------------------------------------------------------ Jaya


def solve_jaya(problem: ORProblem, pop=50, iters=100, seed=42) -> ORResult:
    """x' = x + r1*(best - |x|) - r2*(worst - |x|)  (Rao 2016)."""

    def step(X, fit, rng):
        best = X[fit.argmin()]
        worst = X[fit.argmax()]
        r1 = rng.random(X.shape)
        r2 = rng.random(X.shape)
        Xn = X + r1 * (best - np.abs(X)) - r2 * (worst - np.abs(X))
        return _greedy(problem, X, fit, Xn)

    return _iterate(problem, pop, iters, np.random.default_rng(seed), step)


# ----------------------------------------------------------------- Rao 1-3


def solve_rao(problem: ORProblem, variant=1, pop=50, iters=100, seed=42) -> ORResult:
    """Rao-1/2/3 metaphor-less algorithms (Rao 2020):
    Rao-1: x' = x + r1*(best - worst)
    Rao-2: ... + r2*(|x| - |xk|) with the sign chosen by whichever of
           x / random partner xk has better fitness
    Rao-3: x' = x + r1*(best - |worst|) + r2*(|x| - xk) likewise."""

    def step(X, fit, rng):
        best = X[fit.argmin()]
        worst = X[fit.argmax()]
        r1 = rng.random(X.shape)
        if variant == 1:
            Xn = X + r1 * (best - worst)
        else:
            k = rng.integers(len(X), size=len(X))
            Xk, fk = X[k], fit[k]
            i_better = (fit <= fk)[:, None]
            r2 = rng.random(X.shape)
            if variant == 2:
                inter = np.where(
                    i_better, np.abs(X) - np.abs(Xk), np.abs(Xk) - np.abs(X)
                )
                Xn = X + r1 * (best - worst) + r2 * inter
            else:
                inter = np.where(i_better, np.abs(X) - Xk, np.abs(Xk) - X)
                Xn = X + r1 * (best - np.abs(worst)) + r2 * inter
        return _greedy(problem, X, fit, Xn)

    return _iterate(problem, pop, iters, np.random.default_rng(seed), step)


# ------------------------------------------------------------------- TLBO


def solve_tlbo(problem: ORProblem, pop=50, iters=100, seed=42) -> ORResult:
    """Teaching-Learning-Based Optimization (Rao et al. 2011):
    teacher phase pulls toward best vs TF*mean, learner phase moves
    along pairwise fitness gradients; greedy acceptance after each."""

    def step(X, fit, rng):
        # teacher phase
        teacher = X[fit.argmin()]
        mean = X.mean(axis=0)
        tf = rng.integers(1, 3, size=(len(X), 1)).astype(float)
        r = rng.random(X.shape)
        X, fit = _greedy(problem, X, fit, X + r * (teacher - tf * mean))
        # learner phase
        k = rng.integers(len(X), size=len(X))
        Xk, fk = X[k], fit[k]
        direction = np.where((fit < fk)[:, None], X - Xk, Xk - X)
        r = rng.random(X.shape)
        return _greedy(problem, X, fit, X + r * direction)

    return _iterate(problem, pop, iters, np.random.default_rng(seed), step)


# --------------------------------------------------------------------- GA


def solve_ga(problem: ORProblem, pop=50, iters=100, seed=42) -> ORResult:
    """Real-coded GA: tournament selection, blend crossover, Gaussian
    mutation, one-elite survival."""
    rng = np.random.default_rng(seed)
    X = problem.init_population(pop, rng)
    fit = problem.fitness(X)
    span = problem.upper - problem.lower
    history = []
    for _ in range(iters):
        # binary-tournament parents
        a = rng.integers(pop, size=pop)
        b = rng.integers(pop, size=pop)
        parents = np.where((fit[a] <= fit[b])[:, None], X[a], X[b])
        partner = parents[rng.permutation(pop)]
        # blend (BLX-alpha=0.5 collapsed to uniform mix) + mutation
        mix = rng.random((pop, 1))
        children = mix * parents + (1 - mix) * partner
        mut = rng.random(children.shape) < 0.1
        children = children + mut * rng.normal(0, 0.1 * span, children.shape)
        children = problem.clip(children)
        cfit = problem.fitness(children)
        # elitism: keep the incumbent best in slot of worst child
        e = int(fit.argmin())
        w = int(cfit.argmax())
        children[w], cfit[w] = X[e], fit[e]
        X, fit = children, cfit
        history.append(float(fit.min()))
    i = int(fit.argmin())
    return ORResult(X[i], float(fit[i]), history)


# --------------------------------------------------------------------- SA


def solve_sa(problem: ORProblem, pop=50, iters=100, seed=42) -> ORResult:
    """Simulated annealing; ``pop`` independent chains run as one
    vectorized batch so the cost per iteration matches the population
    solvers.  Exponential cooling, Gaussian proposals."""
    rng = np.random.default_rng(seed)
    X = problem.init_population(pop, rng)
    fit = problem.fitness(X)
    span = problem.upper - problem.lower
    t0, t_end = 1.0, 1e-3
    best_x, best_f = X[fit.argmin()].copy(), float(fit.min())
    history = []
    for it in range(iters):
        t = t0 * (t_end / t0) ** (it / max(iters - 1, 1))
        Xn = problem.clip(X + rng.normal(0, 0.1 * span * t + 1e-9, X.shape))
        fn = problem.fitness(Xn)
        accept = (fn < fit) | (
            rng.random(pop) < np.exp(-(fn - fit) / (t * max(abs(best_f), 1.0)))
        )
        X[accept] = Xn[accept]
        fit[accept] = fn[accept]
        if float(fit.min()) < best_f:
            i = int(fit.argmin())
            best_x, best_f = X[i].copy(), float(fit[i])
        history.append(best_f)
    return ORResult(best_x, best_f, history)


# ---------------------------------------------------------------- NSGA-II


@dataclass
class ParetoResult:
    front_variables: np.ndarray  # (front, dim)
    front_fitness: np.ndarray  # (front, n_obj)
    history: list[float]  # front size per iteration


def _non_dominated_sort(Fobj: np.ndarray) -> list[np.ndarray]:
    """Fast non-dominated sort (Deb et al. 2002).  Returns index arrays
    per front."""
    n = len(Fobj)
    # dominates[i, j] = i dominates j
    le = (Fobj[:, None, :] <= Fobj[None, :, :]).all(axis=2)
    lt = (Fobj[:, None, :] < Fobj[None, :, :]).any(axis=2)
    dom = le & lt
    n_dominators = dom.sum(axis=0)
    fronts = []
    remaining = np.arange(n)
    counts = n_dominators.copy()
    while len(remaining):
        mask = counts[remaining] == 0
        front = remaining[mask]
        if len(front) == 0:  # numerical safety; cannot normally happen
            front = remaining
        fronts.append(front)
        remaining = remaining[~mask]
        if len(remaining):
            counts[remaining] -= dom[np.ix_(front, remaining)].sum(axis=0)
    return fronts


def _crowding(Fobj: np.ndarray) -> np.ndarray:
    n, m = Fobj.shape
    d = np.zeros(n)
    for j in range(m):
        order = np.argsort(Fobj[:, j])
        span = Fobj[order[-1], j] - Fobj[order[0], j]
        d[order[0]] = d[order[-1]] = np.inf
        if span > 0 and n > 2:
            d[order[1:-1]] += (
                Fobj[order[2:], j] - Fobj[order[:-2], j]
            ) / span
    return d


def solve_nsga2(problem: ORProblem, pop=50, iters=100, seed=42) -> ParetoResult:
    """NSGA-II (Deb et al. 2002): non-dominated sort + crowding-
    distance survival over blend-crossover/Gaussian-mutation children."""
    rng = np.random.default_rng(seed)
    X = problem.init_population(pop, rng)
    Fo = problem.objectives(X)
    span = problem.upper - problem.lower
    history = []
    for _ in range(iters):
        # variation (same operators as the GA)
        a = rng.integers(pop, size=pop)
        b = rng.integers(pop, size=pop)
        mix = rng.random((pop, 1))
        children = mix * X[a] + (1 - mix) * X[b]
        mut = rng.random(children.shape) < 0.1
        children = problem.clip(
            children + mut * rng.normal(0, 0.1 * span, children.shape)
        )
        Cf = problem.objectives(children)
        # environmental selection over parents + children
        U = np.vstack([X, children])
        Uf = np.vstack([Fo, Cf])
        keep: list[int] = []
        for front in _non_dominated_sort(Uf):
            if len(keep) + len(front) <= pop:
                keep.extend(front.tolist())
            else:
                d = _crowding(Uf[front])
                order = front[np.argsort(-d)]
                keep.extend(order[: pop - len(keep)].tolist())
                break
        X, Fo = U[keep], Uf[keep]
        history.append(float(len(_non_dominated_sort(Fo)[0])))
    front = _non_dominated_sort(Fo)[0]
    return ParetoResult(X[front], Fo[front], history)


# ------------------------------------------------------------- dispatcher

_SINGLE = {
    "jaya": solve_jaya,
    "rao1": lambda p, **kw: solve_rao(p, variant=1, **kw),
    "rao2": lambda p, **kw: solve_rao(p, variant=2, **kw),
    "rao3": lambda p, **kw: solve_rao(p, variant=3, **kw),
    "tlbo": solve_tlbo,
    "ga": solve_ga,
    "sa": solve_sa,
}

MULTI_ALGORITHMS = {"nsga2", "motlbo"}


def solve(problem: ORProblem, algorithm="Jaya", pop=50, iters=100, seed=42):
    """Reference dispatch (operator.rs:6704-6745): multi-objective
    algorithms (or >1 cost vector) -> NSGA-II; unknown single-objective
    names default to Jaya."""
    name = algorithm.lower()
    if name in MULTI_ALGORITHMS or (
        problem.multi_costs is not None and len(problem.multi_costs) > 1
    ):
        if problem.multi_costs is None:
            problem.multi_costs = problem.costs[None, :]
        return solve_nsga2(problem, pop=pop, iters=iters, seed=seed)
    fn = _SINGLE.get(name, solve_jaya)
    return fn(problem, pop=pop, iters=iters, seed=seed)

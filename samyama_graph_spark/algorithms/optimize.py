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
Vakharia 2011), real-coded GA, simulated annealing, the swarm classics
the reference exposes (Firefly, Cuckoo, GWO, Bat, ABC, GSA, HS, FPA on
the Cypher dispatch, operator.rs:6729-6744; PSO and DE only on the
HTTP optimize surface, http/optimize.rs:610-611 — see solve() for the
deliberate single-dispatch widening), and the Rao-family
extensions its bench suite runs (BMR/BWR/BMWR, QO-Jaya, QO-Rao,
ITLBO, GOTLBO, SAMP-Jaya, EHR-Jaya, SAPHR and the MO-BMWR / MO-Rao+DE
/ MOTLBO multi-objective solvers — benches/rao_family_benchmark.rs) —
vectorized over numpy: every population update is O(pop x dim) array
arithmetic.
Like the reference (which collects the label's nodes into driver
vectors), the solve itself is driver-side; the graph side — cost
gathering and solution write-back — stays DataFrame-native.  Practical
bound: dim = node count of the label (guarded below, like maxFlow).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Callable

import numpy as np

MAX_DIM = 2_000_000  # driver-side vectors: 16MB/array at this size


@dataclass
class ORProblem:
    """minimize sum(x * costs) + penalties, x in [lower, upper]^dim.

    ``fitness_fn`` / ``objective_fn`` (batch: (pop, dim) -> (pop,) /
    (pop, n_obj)) override the linear form — the analogue of the
    reference's SimpleProblem (common/mod.rs), used by the published
    test functions (sphere, rastrigin, ZDT, DTLZ) its Rao-family bench
    runs (benches/rao_family_benchmark.rs:20-70)."""

    costs: np.ndarray  # (dim,) single-objective coefficients
    lower: float
    upper: float
    budget: float | None = None
    min_total: float | None = None
    multi_costs: np.ndarray | None = None  # (n_obj, dim) for NSGA-II
    fitness_fn: Callable[[np.ndarray], np.ndarray] | None = None
    objective_fn: Callable[[np.ndarray], np.ndarray] | None = None

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
        if self.fitness_fn is not None:
            return self.fitness_fn(X) + self.penalty(X)
        return X @ self.costs + self.penalty(X)

    def objectives(self, X: np.ndarray) -> np.ndarray:
        """(pop, n_obj) objective matrix for multi-objective solvers;
        the constraint penalty is added to every objective."""
        if self.objective_fn is not None:
            return self.objective_fn(X) + self.penalty(X)[:, None]
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


# ------------------------------------------------------ swarm classics
# The or.solve surface dispatches these by name (operator.rs:6729-6744).
# All are published formulations, vectorized over the population.


def solve_pso(problem: ORProblem, pop=50, iters=100, seed=42) -> ORResult:
    """Particle Swarm (Kennedy & Eberhart 1995), global-best topology:
    v' = w*v + c1*r1*(pbest - x) + c2*r2*(gbest - x), inertia 0.9->0.4,
    velocity clamped to 20% of the range (algorithms/pso.rs)."""
    rng = np.random.default_rng(seed)
    X = problem.init_population(pop, rng)
    fit = problem.fitness(X)
    span = problem.upper - problem.lower
    V = np.zeros_like(X)
    P, pf = X.copy(), fit.copy()
    g = int(pf.argmin())
    history = []
    for it in range(iters):
        w = 0.9 - 0.5 * it / max(iters - 1, 1)
        r1, r2 = rng.random(X.shape), rng.random(X.shape)
        V = w * V + 2.0 * r1 * (P - X) + 2.0 * r2 * (P[g] - X)
        V = np.clip(V, -0.2 * span, 0.2 * span)
        X = problem.clip(X + V)
        fit = problem.fitness(X)
        better = fit < pf
        P[better], pf[better] = X[better], fit[better]
        g = int(pf.argmin())
        history.append(float(pf[g]))
    return ORResult(P[g], float(pf[g]), history)


def solve_de(problem: ORProblem, pop=50, iters=100, seed=42, f=0.5, cr=0.9) -> ORResult:
    """DE/rand/1/bin (Storn & Price 1997): mutant = a + F*(b - c),
    binomial crossover with a forced dimension, greedy selection
    (algorithms/de.rs)."""

    def step(X, fit, rng):
        n, d = X.shape
        a, b, c = (rng.integers(n, size=n) for _ in range(3))
        mutant = X[a] + f * (X[b] - X[c])
        cross = rng.random(X.shape) < cr
        cross[np.arange(n), rng.integers(d, size=n)] = True
        return _greedy(problem, X, fit, np.where(cross, mutant, X))

    return _iterate(problem, pop, iters, np.random.default_rng(seed), step)


def solve_firefly(problem: ORProblem, pop=50, iters=100, seed=42) -> ORResult:
    """Firefly (Yang 2008): each firefly moves toward brighter ones
    with attractiveness beta0*exp(-gamma*r^2) plus a decaying random
    walk; batch form sums attractions from one population snapshot
    (algorithms/firefly.rs)."""
    span = max(problem.upper - problem.lower, 1e-12)
    gamma = 1.0 / span**2
    alpha0, beta0 = 0.2, 1.0
    it_box = [0]

    def step(X, fit, rng):
        alpha = alpha0 * (0.97 ** it_box[0])
        it_box[0] += 1
        diff = X[None, :, :] - X[:, None, :]  # [i, j] = X[j] - X[i]
        d2 = (diff**2).sum(-1)
        beta = beta0 * np.exp(-gamma * d2)
        brighter = (fit[None, :] < fit[:, None]).astype(float)
        w = beta * brighter
        move = (w[:, :, None] * diff).sum(1) / np.maximum(
            brighter.sum(1), 1.0
        )[:, None]
        Xn = X + move + alpha * span * (rng.random(X.shape) - 0.5)
        return _greedy(problem, X, fit, Xn)

    return _iterate(problem, pop, iters, np.random.default_rng(seed), step)


def _levy(rng: np.random.Generator, shape, beta=1.5) -> np.ndarray:
    """Mantegna's algorithm for Levy-stable step lengths."""
    num = math.gamma(1 + beta) * math.sin(math.pi * beta / 2)
    den = math.gamma((1 + beta) / 2) * beta * 2 ** ((beta - 1) / 2)
    sigma = (num / den) ** (1 / beta)
    u = rng.normal(0, sigma, shape)
    v = rng.normal(0, 1, shape)
    return u / np.maximum(np.abs(v), 1e-12) ** (1 / beta)


def solve_cuckoo(problem: ORProblem, pop=50, iters=100, seed=42, pa=0.25) -> ORResult:
    """Cuckoo Search (Yang & Deb 2009): Levy flights around the best
    nest + abandonment of a pa-fraction via a biased random walk
    (algorithms/cuckoo.rs)."""

    def step(X, fit, rng):
        best = X[fit.argmin()]
        Xn = X + 0.01 * _levy(rng, X.shape) * (X - best)
        X, fit = _greedy(problem, X, fit, Xn)
        aband = (rng.random((len(X), 1)) < pa).astype(float)
        d1 = rng.integers(len(X), size=len(X))
        d2 = rng.integers(len(X), size=len(X))
        Xn = X + aband * rng.random(X.shape) * (X[d1] - X[d2])
        return _greedy(problem, X, fit, Xn)

    return _iterate(problem, pop, iters, np.random.default_rng(seed), step)


def solve_gwo(problem: ORProblem, pop=50, iters=100, seed=42) -> ORResult:
    """Grey Wolf Optimizer (Mirjalili et al. 2014): candidates average
    the alpha/beta/delta encirclement positions, a decays 2->0
    (algorithms/gwo.rs).  Greedy acceptance keeps the incumbent when
    the encircle move regresses (the reference tracks best-so-far the
    same way)."""

    def make_step():
        it_box = [0]

        def step(X, fit, rng):
            order = np.argsort(fit)
            leaders = X[order[:3]]
            a = 2.0 * (1 - it_box[0] / max(len_iters - 1, 1))
            it_box[0] += 1
            acc = np.zeros_like(X)
            for ldr in leaders:
                r1, r2 = rng.random(X.shape), rng.random(X.shape)
                A = 2 * a * r1 - a
                C = 2 * r2
                acc += ldr - A * np.abs(C * ldr - X)
            return _greedy(problem, X, fit, acc / 3.0)

        return step

    len_iters = iters
    return _iterate(problem, pop, iters, np.random.default_rng(seed), make_step())


def solve_bat(problem: ORProblem, pop=50, iters=100, seed=42) -> ORResult:
    """Bat Algorithm (Yang 2010): frequency-tuned velocities, local
    search around the best scaled by mean loudness, acceptance gated
    on loudness A (0.9-annealed) and pulse rate r (algorithms/bat.rs)."""
    rng = np.random.default_rng(seed)
    X = problem.init_population(pop, rng)
    fit = problem.fitness(X)
    span = problem.upper - problem.lower
    V = np.zeros_like(X)
    A, r0 = 0.9, 0.5
    best_i = int(fit.argmin())
    best_x, best_f = X[best_i].copy(), float(fit[best_i])
    history = []
    for it in range(iters):
        loud = A * (0.9**it)
        rt = r0 * (1 - math.exp(-0.9 * it))
        q = rng.random((pop, 1)) * 2.0
        V = V + (X - best_x) * q
        Xn = X + V
        local = rng.random(pop) > rt
        Xn[local] = best_x + 0.01 * span * rng.normal(
            size=(int(local.sum()), X.shape[1])
        )
        Xn = problem.clip(Xn)
        fn = problem.fitness(Xn)
        accept = (fn < fit) & (rng.random(pop) < max(loud, 0.05))
        X[accept], fit[accept] = Xn[accept], fn[accept]
        i = int(fit.argmin())
        if float(fit[i]) < best_f:
            best_x, best_f = X[i].copy(), float(fit[i])
        history.append(best_f)
    return ORResult(best_x, best_f, history)


def solve_abc(problem: ORProblem, pop=50, iters=100, seed=42, limit=20) -> ORResult:
    """Artificial Bee Colony (Karaboga 2005): employed perturbation of
    one dimension toward a random partner, fitness-proportional
    onlooker re-search, trial-counter scouts (algorithms/abc.rs)."""
    rng = np.random.default_rng(seed)
    X = problem.init_population(pop, rng)
    fit = problem.fitness(X)
    trials = np.zeros(pop)
    rows = np.arange(pop)
    history = []

    def local_search(src: np.ndarray) -> None:
        k = rng.integers(pop, size=len(src))
        j = rng.integers(X.shape[1], size=len(src))
        cand = X[src].copy()
        phi = rng.uniform(-1, 1, len(src))
        cand[np.arange(len(src)), j] = X[src, j] + phi * (X[src, j] - X[k, j])
        cand = problem.clip(cand)
        cf = problem.fitness(cand)
        for s, c, f in zip(src, cand, cf):  # later duplicates win; ok
            if f < fit[s]:
                X[s], fit[s], trials[s] = c, f, 0
            else:
                trials[s] += 1

    for _ in range(iters):
        local_search(rows)  # employed phase
        w = 1.0 / (1.0 + fit - fit.min())
        local_search(rng.choice(pop, size=pop, p=w / w.sum()))  # onlookers
        scouts = trials > limit
        n_sc = int(scouts.sum())
        if n_sc:
            X[scouts] = rng.uniform(
                problem.lower, problem.upper, (n_sc, X.shape[1])
            )
            fit[scouts] = problem.fitness(X[scouts])
            trials[scouts] = 0
        history.append(float(fit.min()))
    i = int(fit.argmin())
    return ORResult(X[i], float(fit[i]), history)


def solve_gsa(problem: ORProblem, pop=50, iters=100, seed=42, g0=100.0) -> ORResult:
    """Gravitational Search (Rashedi et al. 2009): fitness-derived
    masses, exponentially decaying G, force from a shrinking Kbest
    elite set (algorithms/gsa.rs)."""
    rng = np.random.default_rng(seed)
    X = problem.init_population(pop, rng)
    fit = problem.fitness(X)
    V = np.zeros_like(X)
    best_x, best_f = X[fit.argmin()].copy(), float(fit.min())
    history = []
    for it in range(iters):
        G = g0 * math.exp(-20.0 * it / iters)
        w = fit.max() - fit + 1e-12
        m = w / w.sum()
        kbest = max(1, int(round(pop * (1 - it / iters))))
        elite = np.argsort(fit)[:kbest]
        diff = X[elite][None, :, :] - X[:, None, :]
        dist = np.sqrt((diff**2).sum(-1)) + 1e-9
        acc = (
            rng.random((pop, kbest, 1))
            * G
            * m[elite][None, :, None]
            * diff
            / dist[:, :, None]
        ).sum(1)
        V = rng.random(X.shape) * V + acc
        X = problem.clip(X + V)
        fit = problem.fitness(X)
        i = int(fit.argmin())
        if float(fit[i]) < best_f:
            best_x, best_f = X[i].copy(), float(fit[i])
        history.append(best_f)
    return ORResult(best_x, best_f, history)


def solve_hs(problem: ORProblem, pop=50, iters=100, seed=42, hmcr=0.9, par=0.3) -> ORResult:
    """Harmony Search (Geem et al. 2001), batch form: each candidate
    variable comes from harmony memory w.p. HMCR (pitch-adjusted w.p.
    PAR by bandwidth 5% of range), else uniform; the union's best pop
    rows survive (algorithms/hs.rs)."""
    span = problem.upper - problem.lower
    bw = 0.05 * span

    def step(X, fit, rng):
        n, d = X.shape
        mem = X[rng.integers(n, size=(n, d)), np.arange(d)[None, :]]
        adj = rng.random((n, d)) < par
        mem = mem + adj * rng.uniform(-1, 1, (n, d)) * bw
        rand = rng.uniform(problem.lower, problem.upper, (n, d))
        cand = np.where(rng.random((n, d)) < hmcr, mem, rand)
        cand = problem.clip(cand)
        cf = problem.fitness(cand)
        U = np.vstack([X, cand])
        uf = np.concatenate([fit, cf])
        keep = np.argsort(uf, kind="stable")[:n]
        return U[keep], uf[keep]

    return _iterate(problem, pop, iters, np.random.default_rng(seed), step)


def solve_fpa(problem: ORProblem, pop=50, iters=100, seed=42, p=0.8) -> ORResult:
    """Flower Pollination (Yang 2012): global Levy pollination toward
    the best w.p. p, else local mixing of two random flowers; greedy
    acceptance (algorithms/fpa.rs)."""

    def step(X, fit, rng):
        best = X[fit.argmin()]
        glob = X + 0.1 * _levy(rng, X.shape) * (best - X)
        j = rng.integers(len(X), size=len(X))
        k = rng.integers(len(X), size=len(X))
        loc = X + rng.random((len(X), 1)) * (X[j] - X[k])
        Xn = np.where(rng.random((len(X), 1)) < p, glob, loc)
        return _greedy(problem, X, fit, Xn)

    return _iterate(problem, pop, iters, np.random.default_rng(seed), step)


# ------------------------------------------------- Rao-family extensions
# benches/rao_family_benchmark.rs: BMR / BWR / BMWR, SAMP-Jaya, EHR-Jaya,
# QO-Jaya, QO-Rao, SAPHR, ITLBO, GOTLBO vs the Jaya/Rao baselines.


def solve_bmr(problem: ORProblem, pop=50, iters=100, seed=42) -> ORResult:
    """BMR — Best-Mean-Random (Rao 2024, bmr.rs:40-88): w.p. 1/2
    x' = x + r1*(best - T*mean) + r2*(best - rand_box) with T in {1,2},
    else a bounds-based random restart; greedy acceptance."""

    def step(X, fit, rng):
        n = len(X)
        best = X[fit.argmin()]
        mean = X.mean(0)
        r1, r2, r3, r4 = (rng.random((n, 1)) for _ in range(4))
        T = rng.integers(1, 3, size=(n, 1)).astype(float)
        R = rng.uniform(problem.lower, problem.upper, X.shape)
        expl = X + r1 * (best - T * mean) + r2 * (best - R)
        restart = problem.upper - (problem.upper - problem.lower) * r3
        Xn = np.where(r4 > 0.5, expl, np.broadcast_to(restart, X.shape))
        return _greedy(problem, X, fit, Xn)

    return _iterate(problem, pop, iters, np.random.default_rng(seed), step)


def solve_bwr(problem: ORProblem, pop=50, iters=100, seed=42) -> ORResult:
    """BWR — Best-Worst-Random (Rao 2024, bwr.rs:40-90): w.p. 1/2
    x' = x + r1*(best - T*rand_box) - r2*(worst - rand_box), else the
    same random restart; greedy acceptance."""

    def step(X, fit, rng):
        n = len(X)
        best = X[fit.argmin()]
        worst = X[fit.argmax()]
        r1, r2, r3, r4 = (rng.random((n, 1)) for _ in range(4))
        T = rng.integers(1, 3, size=(n, 1)).astype(float)
        R = rng.uniform(problem.lower, problem.upper, X.shape)
        expl = X + r1 * (best - T * R) - r2 * (worst - R)
        restart = problem.upper - (problem.upper - problem.lower) * r3
        Xn = np.where(r4 > 0.5, expl, np.broadcast_to(restart, X.shape))
        return _greedy(problem, X, fit, Xn)

    return _iterate(problem, pop, iters, np.random.default_rng(seed), step)


def solve_bmwr(problem: ORProblem, pop=50, iters=100, seed=42) -> ORResult:
    """BMWR — Best-Mean-Worst-Random (Rao 2025, bmwr.rs:7-16): BMR's
    best-vs-mean attraction + best-vs-random pull + BWR's worst
    repulsion, random partner drawn from the population snapshot;
    restart branch and greedy acceptance as in BMR/BWR."""

    def step(X, fit, rng):
        n = len(X)
        best = X[fit.argmin()]
        worst = X[fit.argmax()]
        mean = X.mean(0)
        r1, r2, r3, r4, r5 = (rng.random((n, 1)) for _ in range(5))
        T = rng.integers(1, 3, size=(n, 1)).astype(float)
        k = (np.arange(n) + 1 + rng.integers(n - 1, size=n)) % n  # != self
        Xr = X[k]
        expl = (
            X
            + r1 * (best - T * mean)
            + r2 * (best - Xr)
            - r5 * (worst - Xr)
        )
        restart = problem.upper - (problem.upper - problem.lower) * r3
        Xn = np.where(r4 > 0.5, expl, np.broadcast_to(restart, X.shape))
        return _greedy(problem, X, fit, Xn)

    return _iterate(problem, pop, iters, np.random.default_rng(seed), step)


def _quasi_opposite(
    X: np.ndarray, lo: float, hi: float, rng: np.random.Generator
) -> np.ndarray:
    """QOBL point: uniform between the interval center and the
    opposite point lo+hi-x (qo_rao.rs:7-12)."""
    c = (lo + hi) / 2.0
    xo = lo + hi - X
    lo_q = np.minimum(c, xo)
    return lo_q + rng.random(X.shape) * (np.maximum(c, xo) - lo_q)


def solve_qojaya(problem: ORProblem, pop=50, iters=100, seed=42) -> ORResult:
    """QO-Jaya (Rao & Rai 2017, qojaya.rs): the Jaya update followed by
    quasi-opposition-based learning — each survivor is compared with
    its quasi-opposite and the better one is kept."""

    def step(X, fit, rng):
        best = X[fit.argmin()]
        worst = X[fit.argmax()]
        r1, r2 = rng.random(X.shape), rng.random(X.shape)
        Xn = X + r1 * (best - np.abs(X)) - r2 * (worst - np.abs(X))
        X, fit = _greedy(problem, X, fit, Xn)
        return _greedy(
            problem, X, fit,
            _quasi_opposite(X, problem.lower, problem.upper, rng),
        )

    return _iterate(problem, pop, iters, np.random.default_rng(seed), step)


def solve_qo_rao(problem: ORProblem, variant=1, pop=50, iters=100, seed=42) -> ORResult:
    """QO-Rao (Rao & Saroj 2020, qo_rao.rs): Rao update of the chosen
    variant, then quasi-opposition-based learning keeps the better of
    each survivor and its quasi-opposite."""

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
        X, fit = _greedy(problem, X, fit, Xn)
        return _greedy(
            problem, X, fit,
            _quasi_opposite(X, problem.lower, problem.upper, rng),
        )

    return _iterate(problem, pop, iters, np.random.default_rng(seed), step)


def solve_itlbo(problem: ORProblem, pop=50, iters=100, seed=42) -> ORResult:
    """ITLBO (itlbo.rs): TLBO with 10% elite preservation — after the
    teacher and learner phases the elites of the previous generation
    replace the current worst rows."""
    elite_size = max(1, pop // 10)

    def step(X, fit, rng):
        e = np.argsort(fit, kind="stable")[:elite_size]
        elites, ef = X[e].copy(), fit[e].copy()
        teacher = X[fit.argmin()]
        mean = X.mean(axis=0)
        tf = rng.integers(1, 3, size=(len(X), 1)).astype(float)
        r = rng.random(X.shape)
        X, fit = _greedy(problem, X, fit, X + r * (teacher - tf * mean))
        k = rng.integers(len(X), size=len(X))
        Xk, fk = X[k], fit[k]
        direction = np.where((fit < fk)[:, None], X - Xk, Xk - X)
        r = rng.random(X.shape)
        X, fit = _greedy(problem, X, fit, X + r * direction)
        w = np.argsort(fit, kind="stable")[-elite_size:]
        better = ef < fit[w]
        X[w[better]] = elites[better]
        fit[w[better]] = ef[better]
        return X, fit

    return _iterate(problem, pop, iters, np.random.default_rng(seed), step)


def solve_gotlbo(problem: ORProblem, pop=50, iters=100, seed=42, jr=0.3) -> ORResult:
    """GOTLBO (Chen et al. 2016, gotlbo.rs): TLBO with generalized
    opposition-based learning — w.p. jr the generation is unioned with
    its dynamic-bounds opposite population and the best pop rows
    survive."""

    def step(X, fit, rng):
        teacher = X[fit.argmin()]
        mean = X.mean(axis=0)
        tf = rng.integers(1, 3, size=(len(X), 1)).astype(float)
        r = rng.random(X.shape)
        X, fit = _greedy(problem, X, fit, X + r * (teacher - tf * mean))
        k = rng.integers(len(X), size=len(X))
        Xk, fk = X[k], fit[k]
        direction = np.where((fit < fk)[:, None], X - Xk, Xk - X)
        r = rng.random(X.shape)
        X, fit = _greedy(problem, X, fit, X + r * direction)
        if rng.random() < jr:
            dmin, dmax = X.min(0), X.max(0)
            Xo = problem.clip(
                rng.random((len(X), 1)) * (dmin + dmax) - X
            )
            fo = problem.fitness(Xo)
            U = np.vstack([X, Xo])
            uf = np.concatenate([fit, fo])
            keep = np.argsort(uf, kind="stable")[: len(X)]
            X, fit = U[keep], uf[keep]
        return X, fit

    return _iterate(problem, pop, iters, np.random.default_rng(seed), step)


def solve_samp_jaya(problem: ORProblem, pop=50, iters=100, seed=42) -> ORResult:
    """SAMP-Jaya (Rao & Saroj 2017, samp_jaya.rs:1-9): the population
    is split into m sub-populations that evolve with independent Jaya
    updates; m grows when the global best improved this iteration and
    shrinks otherwise, m in [1, max(pop//4, 2)]."""
    rng = np.random.default_rng(seed)
    X = problem.init_population(pop, rng)
    fit = problem.fitness(X)
    m, m_max = 2, max(pop // 4, 2)
    gbest = float(fit.min())
    history = []
    for _ in range(iters):
        perm = rng.permutation(pop)
        chunks = np.array_split(perm, m)
        for idx in chunks:
            sub, sf = X[idx], fit[idx]
            best = sub[sf.argmin()]
            worst = sub[sf.argmax()]
            r1 = rng.random(sub.shape)
            r2 = rng.random(sub.shape)
            cand = problem.clip(
                sub + r1 * (best - np.abs(sub)) - r2 * (worst - np.abs(sub))
            )
            cf = problem.fitness(cand)
            better = cf < sf
            rows = idx[better]
            X[rows], fit[rows] = cand[better], cf[better]
        cur = float(fit.min())
        m = min(m + 1, m_max) if cur < gbest else max(m - 1, 1)
        gbest = min(gbest, cur)
        history.append(gbest)
    i = int(fit.argmin())
    return ORResult(X[i], float(fit[i]), history)


def solve_ehrjaya(problem: ORProblem, pop=50, iters=100, seed=42) -> ORResult:
    """EHR-Jaya (Wang et al. 2022, ehrjaya.rs:1-11): rank the
    population; the top half uses the Rao-1 pull (best - worst), the
    bottom half the full Jaya update; greedy acceptance."""

    def step(X, fit, rng):
        best = X[fit.argmin()]
        worst = X[fit.argmax()]
        rank = np.argsort(np.argsort(fit, kind="stable"))
        high = (rank < len(X) // 2)[:, None]
        r1, r2 = rng.random(X.shape), rng.random(X.shape)
        rao1 = X + r1 * (best - worst)
        jaya = X + r1 * (best - np.abs(X)) - r2 * (worst - np.abs(X))
        return _greedy(problem, X, fit, np.where(high, rao1, jaya))

    return _iterate(problem, pop, iters, np.random.default_rng(seed), step)


def solve_saphr(problem: ORProblem, pop=50, iters=100, seed=42, epsilon=0.2) -> ORResult:
    """SAPHR (saphr.rs:1-8): per-individual self-adaptive choice among
    Rao-1/2/3 by accumulated improvement, with epsilon-greedy
    exploration; greedy acceptance."""
    rng = np.random.default_rng(seed)
    X = problem.init_population(pop, rng)
    fit = problem.fitness(X)
    scores = np.zeros((pop, 3))
    rows = np.arange(pop)
    history = []
    for _ in range(iters):
        best = X[fit.argmin()]
        worst = X[fit.argmax()]
        choice = scores.argmax(1)
        explore = rng.random(pop) < epsilon
        choice[explore] = rng.integers(3, size=int(explore.sum()))
        k = rng.integers(pop, size=pop)
        Xk, fk = X[k], fit[k]
        i_better = (fit <= fk)[:, None]
        r1, r2 = rng.random(X.shape), rng.random(X.shape)
        cand = np.stack([
            X + r1 * (best - worst),
            X + r1 * (best - worst) + r2 * np.where(
                i_better, np.abs(X) - np.abs(Xk), np.abs(Xk) - np.abs(X)
            ),
            X + r1 * (best - np.abs(worst)) + r2 * np.where(
                i_better, np.abs(X) - Xk, np.abs(Xk) - X
            ),
        ])[choice, rows]
        cand = problem.clip(cand)
        cf = problem.fitness(cand)
        scores[rows, choice] += np.maximum(fit - cf, 0.0)
        better = cf < fit
        X[better], fit[better] = cand[better], cf[better]
        history.append(float(fit.min()))
    i = int(fit.argmin())
    return ORResult(X[i], float(fit[i]), history)


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
        keep = _env_select(Uf, pop)
        X, Fo = U[keep], Uf[keep]
        history.append(float(len(_non_dominated_sort(Fo)[0])))
    front = _non_dominated_sort(Fo)[0]
    return ParetoResult(X[front], Fo[front], history)


def _env_select(Uf: np.ndarray, pop: int) -> list[int]:
    """NSGA-II environmental selection: fill by non-dominated front,
    break the last front by crowding distance."""
    keep: list[int] = []
    for front in _non_dominated_sort(Uf):
        if len(keep) + len(front) <= pop:
            keep.extend(front.tolist())
        else:
            d = _crowding(Uf[front])
            order = front[np.argsort(-d)]
            keep.extend(order[: pop - len(keep)].tolist())
            break
    return keep


def solve_motlbo(problem: ORProblem, pop=50, iters=100, seed=42) -> ParetoResult:
    """MOTLBO (motlbo.rs): TLBO variation with a random rank-0 teacher
    and a domination-directed learner phase; survivors picked by
    NSGA-II-style front + crowding selection over the union."""
    rng = np.random.default_rng(seed)
    X = problem.init_population(pop, rng)
    Fo = problem.objectives(X)
    history = []
    for _ in range(iters):
        front0 = _non_dominated_sort(Fo)[0]
        teacher = X[front0[rng.integers(len(front0))]]
        mean = X.mean(0)
        tf = rng.integers(1, 3, size=(pop, 1)).astype(float)
        r = rng.random(X.shape)
        C1 = problem.clip(X + r * (teacher - tf * mean))
        k = rng.integers(pop, size=pop)
        i_dom = (
            (Fo <= Fo[k]).all(axis=1) & (Fo < Fo[k]).any(axis=1)
        )[:, None]
        r2 = rng.random(X.shape)
        C2 = problem.clip(X + r2 * np.where(i_dom, X - X[k], X[k] - X))
        U = np.vstack([X, C1, C2])
        Uf = np.vstack([Fo, problem.objectives(C1), problem.objectives(C2)])
        keep = _env_select(Uf, pop)
        X, Fo = U[keep], Uf[keep]
        history.append(float(len(_non_dominated_sort(Fo)[0])))
    front = _non_dominated_sort(Fo)[0]
    return ParetoResult(X[front], Fo[front], history)


def solve_mo_bmwr(
    problem: ORProblem,
    variant: str = "bmwr",
    pop=50,
    iters=100,
    seed=42,
    local_step=0.05,
    edge_boost_prob=0.2,
) -> ParetoResult:
    """MO-BMR / MO-BWR / MO-BMWR (mo_bmwr_family.rs:1-14): the BMR/BWR/
    BMWR update against a random rank-0 elite and a last-front worst,
    plus the paper's elite features — Gaussian local exploration around
    elites and probabilistic edge boosting of the front extremes —
    with front+crowding survival."""
    rng = np.random.default_rng(seed)
    X = problem.init_population(pop, rng)
    Fo = problem.objectives(X)
    span = problem.upper - problem.lower
    history = []
    for _ in range(iters):
        fronts = _non_dominated_sort(Fo)
        elites = fronts[0]
        best = X[elites[rng.integers(len(elites))]]
        worst = X[fronts[-1][rng.integers(len(fronts[-1]))]]
        mean = X.mean(0)
        r1, r2, r3, r4, r5 = (rng.random((pop, 1)) for _ in range(5))
        T = rng.integers(1, 3, size=(pop, 1)).astype(float)
        R = rng.uniform(problem.lower, problem.upper, X.shape)
        if variant == "bmr":
            expl = X + r1 * (best - T * mean) + r2 * (best - R)
        elif variant == "bwr":
            expl = X + r1 * (best - T * R) - r2 * (worst - R)
        else:  # bmwr
            k = (np.arange(pop) + 1 + rng.integers(pop - 1, size=pop)) % pop
            Xr = X[k]
            expl = (
                X
                + r1 * (best - T * mean)
                + r2 * (best - Xr)
                - r5 * (worst - Xr)
            )
        restart = problem.upper - (problem.upper - problem.lower) * r3
        Xn = problem.clip(
            np.where(r4 > 0.5, expl, np.broadcast_to(restart, X.shape))
        )
        extras = [
            problem.clip(
                X[elites[rng.integers(len(elites))]]
                + local_step * span * rng.normal(size=X.shape[1])
            )[None, :]
        ]
        if rng.random() < edge_boost_prob:
            j = int(rng.integers(Fo.shape[1]))
            ext = elites[int(Fo[elites, j].argmin())]
            extras.append(
                problem.clip(
                    X[ext] + 0.5 * local_step * span
                    * rng.normal(size=X.shape[1])
                )[None, :]
            )
        E = np.vstack(extras)
        U = np.vstack([X, Xn, E])
        Uf = np.vstack([Fo, problem.objectives(Xn), problem.objectives(E)])
        keep = _env_select(Uf, pop)
        X, Fo = U[keep], Uf[keep]
        history.append(float(len(_non_dominated_sort(Fo)[0])))
    front = _non_dominated_sort(Fo)[0]
    return ParetoResult(X[front], Fo[front], history)


def solve_mo_rao_de(
    problem: ORProblem, pop=50, iters=100, seed=42, p_de=0.5, f=0.5, cr=0.9
) -> ParetoResult:
    """MO-Rao+DE (mo_rao_de.rs:1-7,25-33): per offspring, w.p. p_de a
    DE/rand/1/bin child, else a Rao-1 pull toward a rank-0 best away
    from a last-front worst; front+crowding survival."""
    rng = np.random.default_rng(seed)
    X = problem.init_population(pop, rng)
    Fo = problem.objectives(X)
    history = []
    for _ in range(iters):
        fronts = _non_dominated_sort(Fo)
        best = X[fronts[0][rng.integers(len(fronts[0]))]]
        worst = X[fronts[-1][rng.integers(len(fronts[-1]))]]
        a, b, c = (rng.integers(pop, size=pop) for _ in range(3))
        mutant = X[a] + f * (X[b] - X[c])
        cross = rng.random(X.shape) < cr
        cross[np.arange(pop), rng.integers(X.shape[1], size=pop)] = True
        de_child = np.where(cross, mutant, X)
        rao_child = X + rng.random(X.shape) * (best - worst)
        use_de = (rng.random(pop) < p_de)[:, None]
        Xn = problem.clip(np.where(use_de, de_child, rao_child))
        U = np.vstack([X, Xn])
        Uf = np.vstack([Fo, problem.objectives(Xn)])
        keep = _env_select(Uf, pop)
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
    # swarm classics on the or.solve surface (operator.rs:6729-6744)
    "pso": solve_pso,
    "de": solve_de,
    "firefly": solve_firefly,
    "cuckoo": solve_cuckoo,
    "gwo": solve_gwo,
    "bat": solve_bat,
    "abc": solve_abc,
    "gsa": solve_gsa,
    "hs": solve_hs,
    "fpa": solve_fpa,
    # Rao-family extensions (benches/rao_family_benchmark.rs)
    "bmr": solve_bmr,
    "bwr": solve_bwr,
    "bmwr": solve_bmwr,
    "qojaya": solve_qojaya,
    "qorao": lambda p, **kw: solve_qo_rao(p, variant=1, **kw),
    "itlbo": solve_itlbo,
    "gotlbo": solve_gotlbo,
    "sampjaya": solve_samp_jaya,
    "ehrjaya": solve_ehrjaya,
    "saphr": solve_saphr,
}

_MULTI = {
    "nsga2": solve_nsga2,
    "motlbo": solve_motlbo,
    "mobmr": lambda p, **kw: solve_mo_bmwr(p, variant="bmr", **kw),
    "mobwr": lambda p, **kw: solve_mo_bmwr(p, variant="bwr", **kw),
    "mobmwr": lambda p, **kw: solve_mo_bmwr(p, variant="bmwr", **kw),
    "moraode": solve_mo_rao_de,
}

MULTI_ALGORITHMS = set(_MULTI)


def solve(problem: ORProblem, algorithm="Jaya", pop=50, iters=100, seed=42):
    """Solver dispatch: multi-objective algorithm names (or >1 cost
    vector) route to the named MO solver, defaulting to NSGA-II;
    unknown single-objective names default to Jaya (the reference's
    fallback, operator.rs:6744).

    DELIBERATE WIDENING vs the reference's Cypher-level dispatch
    (operator.rs:6728-6744), which is exact-match on a smaller name
    set: PSO/DE and the swarm classics exist only on the reference's
    HTTP optimize surface (http/optimize.rs:610-611), so its Cypher
    path would route 'PSO'/'DE' to Jaya.  Here ONE dispatch serves
    both surfaces — names are matched case-insensitively with -/_
    stripped, and every solver the reference exposes ANYWHERE is
    reachable from CALL algo.or.solve.  A statement like
    `algorithm: 'PSO'` therefore runs real PSO here but Jaya on the
    reference's Cypher endpoint; callers wanting bit-compatible
    routing should pass the reference's exact Cypher names."""
    name = algorithm.lower().replace("-", "").replace("_", "")
    if name in MULTI_ALGORITHMS or (
        problem.multi_costs is not None and len(problem.multi_costs) > 1
    ):
        if problem.multi_costs is None and problem.objective_fn is None:
            problem.multi_costs = problem.costs[None, :]
        fn = _MULTI.get(name, solve_nsga2)
        return fn(problem, pop=pop, iters=iters, seed=seed)
    fn = _SINGLE.get(name, solve_jaya)
    return fn(problem, pop=pop, iters=iters, seed=seed)

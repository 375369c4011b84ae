"""Differential evolution in pure JAX — the global calibration stage.

Replaces scipy ``differential_evolution`` (reference:
calibration/heston_calibrator.py:416-426, maxiter=100, popsize=15, seed=42,
best1bin, polish=False) with a jit-compiled DE whose entire population is
evaluated as ONE batched objective call per generation — for Heston
calibration that collapses popsize x n_options x 1024 characteristic-function
evaluations into a single fused tensor program (SURVEY.md section 2.3:
"entire DE generation as one batched FFT pricing call").

Semantics follow scipy's best1bin with dithered mutation in [0.5, 1) and
recombination 0.7; exact random streams differ (JAX PRNG vs numpy), which
matches the reference's own tolerance for stochastic-stage variation (tests
assert parameter recovery, not trajectories).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["DEResult", "differential_evolution"]


class DEResult(NamedTuple):
    x: jnp.ndarray
    fun: jnp.ndarray
    population: jnp.ndarray
    population_energies: jnp.ndarray
    n_iter: jnp.ndarray


@partial(jax.jit, static_argnames=("objective", "popsize", "maxiter"))
def differential_evolution(
    objective: Callable[[jnp.ndarray], jnp.ndarray],
    lower: jnp.ndarray,
    upper: jnp.ndarray,
    key: jax.Array,
    x0: jnp.ndarray | None = None,
    popsize: int = 15,
    maxiter: int = 100,
    mutation: tuple = (0.5, 1.0),
    recombination: float = 0.7,
    tol: float = 0.0,
    atol: float = 0.0,
) -> DEResult:
    """Global minimization of a BATCHED objective over a box.

    ``objective`` maps a population (npop, dim) -> (npop,) energies; write it
    so the whole population prices in one tensor op.  ``x0`` (optional warm
    start, reference heston_calibrator.py:411-413) seeds the first member.

    Early termination follows scipy's criterion: iteration stops once
    ``std(energies) <= atol + tol * |mean(energies)|`` (scipy defaults
    tol=0.01).  Here it is OFF by default (tol=0, all ``maxiter``
    generations run): an objective with a large additive floor — e.g. the
    Heston DE stage's coarse-quadrature mismatch on deep-OTM quotes — makes
    the energy-spread criterion fire while the population is still diverse
    in parameter space, degrading the handoff to the local stage.  Enable
    it only when the objective's minimum is near zero.
    """
    lower = jnp.asarray(lower)
    upper = jnp.asarray(upper)
    dim = lower.shape[0]
    npop = popsize * dim

    key, k_init = jax.random.split(key)
    pop = lower + (upper - lower) * jax.random.uniform(k_init, (npop, dim), dtype=lower.dtype)
    if x0 is not None:
        pop = pop.at[0].set(jnp.clip(jnp.asarray(x0, dtype=lower.dtype), lower, upper))

    energies = objective(pop)

    def generation(state, key_g):
        pop, energies = state
        best = pop[jnp.argmin(energies)]

        k_f, k_ab, k_cross, k_fill = jax.random.split(key_g, 4)

        # dithered mutation factor, one per member (scipy semantics)
        F = jax.random.uniform(
            k_f, (npop, 1), minval=mutation[0], maxval=mutation[1], dtype=pop.dtype
        )

        # two distinct random partners a != b (!= i is not enforced by scipy
        # either for best1bin; collisions just weaken one mutant)
        ia = jax.random.randint(k_ab, (npop,), 0, npop)
        shift = jax.random.randint(k_fill, (npop,), 1, npop)
        ib = (ia + shift) % npop

        mutant = best[None, :] + F * (pop[ia] - pop[ib])
        mutant = jnp.clip(mutant, lower, upper)

        # binomial crossover with a guaranteed dimension
        k_mask, k_dim = jax.random.split(k_cross)
        cross = jax.random.uniform(k_mask, (npop, dim), dtype=pop.dtype) < recombination
        forced = jax.nn.one_hot(
            jax.random.randint(k_dim, (npop,), 0, dim), dim, dtype=bool
        )
        trial = jnp.where(cross | forced, mutant, pop)

        trial_energy = objective(trial)
        improved = trial_energy < energies
        pop = jnp.where(improved[:, None], trial, pop)
        energies = jnp.where(improved, trial_energy, energies)
        return (pop, energies), None

    keys = jax.random.split(key, maxiter)

    def converged(energies):
        # a population sitting entirely on an infeasibility penalty plateau
        # (std = 0 at some huge constant) must keep searching, not "converge"
        spread_ok = jnp.std(energies) <= atol + tol * jnp.abs(jnp.mean(energies))
        return spread_ok & jnp.isfinite(jnp.mean(energies)) & (
            jnp.min(energies) < 1e9
        )

    def cond(state):
        pop, energies, it = state
        return (it < maxiter) & ~converged(energies)

    def body(state):
        pop, energies, it = state
        (pop, energies), _ = generation((pop, energies), keys[it])
        return (pop, energies, it + 1)

    pop, energies, n_iter = jax.lax.while_loop(
        cond, body, (pop, energies, jnp.asarray(0))
    )

    ibest = jnp.argmin(energies)
    return DEResult(
        x=pop[ibest],
        fun=energies[ibest],
        population=pop,
        population_energies=energies,
        n_iter=n_iter,
    )

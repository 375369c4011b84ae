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
    param_tol: float = 0.0,
    stagnation_patience: int = 0,
    stagnation_rtol: float = 1e-2,
    target_energy: float = 0.0,
) -> DEResult:
    """Global minimization of a BATCHED objective over a box.

    ``objective`` maps a population (npop, dim) -> (npop,) energies; write it
    so the whole population prices in one tensor op.  ``x0`` (optional warm
    start, reference heston_calibrator.py:411-413) seeds the first member.

    Two early-termination criteria (either stops the loop):

    * scipy's energy-spread rule ``std(energies) <= atol + tol *
      |mean(energies)|`` (scipy default tol=0.01).  OFF by default (tol=0):
      an objective with a large additive floor — e.g. the Heston DE stage's
      coarse-quadrature mismatch on deep-OTM quotes — makes it fire while
      the population is still diverse in parameter space, degrading the
      handoff to the local stage.
    * a PARAMETER-SPACE spread rule, immune to objective floors: stop when
      ``std(pop[:, d]) / (upper - lower)[d] <= param_tol`` for every
      dimension.  Once the population has collapsed to a tiny box the
      best1bin step ``best + F (a - b)`` can no longer explore (a fully
      collapsed population is a DE fixed point), so further generations are
      pure waste — the LM stage takes it from there.  ``param_tol=0``
      fires only on exact collapse; the flagship Heston pipeline uses 1e-2.

    Plus a STAGNATION rule (also floor-immune): stop after
    ``stagnation_patience`` consecutive generations in which the best
    energy improved by less than ``stagnation_rtol`` relatively.  In a
    two-stage pipeline the DE's only job is finding the basin; once the
    best stops moving the LM refinement takes over (measured: LM recovers
    identical parameters from a 20-generation DE as from 100 on the
    flagship surface).  0 = off.

    Plus a TARGET-ENERGY rule: stop as soon as the best member's energy
    falls below ``target_energy`` (0 = off; may be a traced scalar).  The
    stagnation rule measures RELATIVE improvement, which stays large all
    the way down a converging descent (1e-3 -> 1e-4 is a 90% improvement),
    so on easy surfaces neither floor-immune rule fires and the DE burns
    its whole budget polishing a basin the local stage would polish far
    faster.  A basin-capture threshold in the objective's own units cuts
    that: for a sum-of-squared-relative-errors objective,
    ``1e-4 * n_quotes`` means 1% mean relative price error — comfortably
    inside the LM stage's capture basin (regression-tested: identical
    recovery at ~4x fewer generations on the flagship surface).
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

    width = jnp.maximum(upper - lower, 1e-30)

    target = jnp.asarray(target_energy)

    def converged(pop, energies):
        # a population sitting entirely on an infeasibility penalty plateau
        # (std = 0 at some huge constant) must keep searching, not "converge"
        spread_ok = jnp.std(energies) <= atol + tol * jnp.abs(jnp.mean(energies))
        param_ok = jnp.all(jnp.std(pop, axis=0) / width <= param_tol)
        target_ok = (target > 0.0) & (jnp.min(energies) <= target)
        return (spread_ok | param_ok | target_ok) & jnp.isfinite(
            jnp.mean(energies)
        ) & (jnp.min(energies) < 1e9)

    def cond(state):
        pop, energies, it, stall = state
        stagnated = (stagnation_patience > 0) & (stall >= stagnation_patience)
        return (it < maxiter) & ~converged(pop, energies) & ~stagnated

    def body(state):
        pop, energies, it, stall = state
        best_prev = jnp.min(energies)
        (pop, energies), _ = generation((pop, energies), keys[it])
        improved = (best_prev - jnp.min(energies)) > stagnation_rtol * jnp.abs(best_prev)
        stall = jnp.where(improved, 0, stall + 1)
        return (pop, energies, it + 1, stall)

    pop, energies, n_iter, _ = jax.lax.while_loop(
        cond, body, (pop, energies, jnp.asarray(0), jnp.asarray(0))
    )

    ibest = jnp.argmin(energies)
    return DEResult(
        x=pop[ibest],
        fun=energies[ibest],
        population=pop,
        population_energies=energies,
        n_iter=n_iter,
    )

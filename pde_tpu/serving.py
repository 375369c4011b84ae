"""Low-latency option-pricing service with dynamic micro-batching.

The reference serves *data* over REST (data/api.py:365-599) but prices
in-process, per caller, through the OpenMP batch loop
(src/cpp/models/heston.cpp:236-244): each caller pays the full quadrature
for its own handful of quotes.  On TPU the economics invert — one jitted
batched pricer amortizes dispatch, quadrature-rule setup, and the
characteristic-function evaluation across ALL concurrent callers — so the
production-serving design is a **micro-batching front end**:

1. Callers submit :class:`PricingRequest`s and receive futures.
2. A single dispatch thread coalesces the queue into micro-batches
   (``max_batch`` requests or ``max_wait_ms``, whichever first).
3. Batches are padded to a small set of static **shape buckets** so XLA
   compiles a handful of programs once, never per request-count.
4. Each request carries its own Heston parameter vector, so one batch can
   mix underlyings, maturities, calls/puts, and even models-per-desk —
   the pricer is ``vmap``-ed over everything.

The core (:class:`BatchPricer`, :class:`MicroBatchingServer`) is
transport-agnostic and fully testable in-process; :func:`create_pricing_api`
wraps it in the same aiohttp style as the data service for deployment parity
with the reference's per-service containers (deploy/docker/Dockerfile.api).
"""

from __future__ import annotations

import functools
import queue
import threading
import time
from concurrent.futures import Future
from dataclasses import dataclass, field
from typing import List, Optional, Sequence

import numpy as np

__all__ = [
    "PricingRequest",
    "PricingResult",
    "BatchPricer",
    "MicroBatchingServer",
    "create_pricing_api",
]

_DEFAULT_BUCKETS = (8, 32, 128, 512, 2048)


@dataclass(frozen=True)
class PricingRequest:
    """One option quote to price under per-request Heston parameters.

    ``params`` is (kappa, theta, sigma, rho, v0) — the caller (typically a
    signal or risk service holding the day's calibration per underlying)
    supplies it, so a single micro-batch can span underlyings.
    """

    strike: float
    maturity: float
    spot: float
    params: Sequence[float]
    rate: float = 0.0
    dividend: float = 0.0
    is_call: bool = True
    want_greeks: bool = False


@dataclass(frozen=True)
class PricingResult:
    price: float
    delta: Optional[float] = None
    vega: Optional[float] = None

    def to_dict(self) -> dict:
        out = {"price": self.price}
        if self.delta is not None:
            out["delta"] = self.delta
        if self.vega is not None:
            out["vega"] = self.vega
        return out


def _bucket_for(n: int, buckets: Sequence[int]) -> int:
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


class BatchPricer:
    """Shape-bucketed batched Heston pricer (pure device math, no threads).

    One compiled XLA program per (bucket, greeks?) pair; every request in a
    batch carries its own parameter vector, priced by the corrected
    Gauss-Legendre Carr-Madan rule (models/heston.py, reference semantics
    src/cpp/models/heston.cpp:94-151) vmapped over the request axis.
    """

    def __init__(self, buckets: Sequence[int] = _DEFAULT_BUCKETS,
                 n_points: int = 64):
        self.buckets = tuple(sorted(set(int(b) for b in buckets)))
        self.n_points = int(n_points)
        self._price_fn = None
        self._greeks_fn = None

    # -- compiled kernels ---------------------------------------------------
    def _build(self):
        import jax
        import jax.numpy as jnp

        from .models import heston

        def price_one(p_vec, strike, maturity, spot, rate, dividend, is_call):
            p = heston.HestonParams(*[p_vec[i] for i in range(5)])
            return heston.price_carr_madan_gl(
                p, strike, maturity, spot, rate, dividend, is_call,
                n_points=self.n_points,
            )

        vmapped = jax.vmap(price_one)

        @functools.partial(jax.jit)
        def price_batch(p, k, t, s, r, q, cp):
            return vmapped(p, k, t, s, r, q, cp)

        def greeks_one(p_vec, strike, maturity, spot, rate, dividend, is_call):
            def f(spot_, v0_):
                p = heston.HestonParams(
                    p_vec[0], p_vec[1], p_vec[2], p_vec[3], v0_
                )
                return heston.price_carr_madan_gl(
                    p, strike, maturity, spot_, rate, dividend, is_call,
                    n_points=self.n_points,
                )

            price, (delta, dv0) = jax.value_and_grad(f, argnums=(0, 1))(
                spot, p_vec[4]
            )
            # market-convention vega: dV/dsigma_BS ~= dV/dv0 * 2*sqrt(v0)
            # (the reference reports dV/dv0-based vega the same way,
            # src/cpp/solvers/heston_pde.hpp:544-559)
            vega = dv0 * 2.0 * jnp.sqrt(jnp.maximum(p_vec[4], 1e-12))
            return price, delta, vega

        greeks_vmapped = jax.vmap(greeks_one)

        @functools.partial(jax.jit)
        def greeks_batch(p, k, t, s, r, q, cp):
            return greeks_vmapped(p, k, t, s, r, q, cp)

        self._price_fn = price_batch
        self._greeks_fn = greeks_batch

    def warmup(self, greeks: bool = True) -> None:
        """Compile every bucket up front (serving should never pay a first-
        request compile)."""
        import dataclasses

        for b in self.buckets:
            req = PricingRequest(100.0, 1.0, 100.0, (2.0, 0.04, 0.3, -0.7, 0.04))
            self.price([req] * b)
            if greeks:
                self.price([dataclasses.replace(req, want_greeks=True)] * b)

    # -- public -------------------------------------------------------------
    @staticmethod
    def validate(r: PricingRequest) -> None:
        """Reject malformed requests up front.  JAX clamps out-of-range
        gathers instead of raising, so a short parameter vector would
        otherwise price silently wrong — the one failure mode a pricing
        service must never have."""
        p = np.asarray(r.params, dtype=np.float64)
        if p.shape != (5,):
            raise ValueError(
                f"params must be 5 values (kappa, theta, sigma, rho, v0), "
                f"got shape {p.shape}"
            )
        fields = (r.strike, r.maturity, r.spot, r.rate, r.dividend)
        if not (np.all(np.isfinite(p)) and np.all(np.isfinite(fields))):
            raise ValueError("non-finite value in pricing request")
        if r.strike <= 0 or r.spot <= 0:
            raise ValueError("strike and spot must be positive")

    def price(self, requests: List[PricingRequest]) -> List[PricingResult]:
        """Price a batch synchronously (launch + finalize)."""
        return self.finalize(self.price_async(requests))

    def price_async(self, requests: List[PricingRequest]):
        """Launch a batch on the device WITHOUT blocking.

        JAX dispatch is asynchronous — the returned handle holds device
        arrays whose computation is in flight.  :meth:`finalize` blocks on
        the transfer and builds the results.  The split lets a serving loop
        overlap device execution (and, through the remote-TPU tunnel, the
        round-trip) with collecting the next micro-batch."""
        if self._price_fn is None:
            self._build()
        if not requests:
            return (requests, None, None)
        for r in requests:
            self.validate(r)
        import jax.numpy as jnp

        from .core.precision import default_float

        n = len(requests)
        b = _bucket_for(n, self.buckets)
        dtype = default_float()

        def padded(getter, width=None):
            vals = [getter(r) for r in requests]
            vals += [vals[-1]] * (b - n)  # repeat-last padding: always finite
            arr = np.asarray(vals)
            return jnp.asarray(
                arr, dtype=dtype if arr.dtype.kind == "f" else None
            )

        p = padded(lambda r: np.asarray(r.params, dtype=np.float64))
        k = padded(lambda r: r.strike)
        t = padded(lambda r: r.maturity)
        s = padded(lambda r: r.spot)
        rr = padded(lambda r: r.rate)
        q = padded(lambda r: r.dividend)
        cp = padded(lambda r: bool(r.is_call))

        any_greeks = any(r.want_greeks for r in requests)
        prices_dev = self._price_fn(p, k, t, s, rr, q, cp)
        greeks_dev = (self._greeks_fn(p, k, t, s, rr, q, cp)
                      if any_greeks else None)
        return (requests, prices_dev, greeks_dev)

    @staticmethod
    def finalize(handle) -> List[PricingResult]:
        """Block on a :meth:`price_async` handle and build the results."""
        requests, prices_dev, greeks_dev = handle
        if prices_dev is None:
            return []
        n = len(requests)
        prices = np.asarray(prices_dev)[:n]
        if greeks_dev is not None:
            _, gd, gv = greeks_dev
            gd = np.asarray(gd)[:n]
            gv = np.asarray(gv)[:n]
        out: List[PricingResult] = []
        for i, r in enumerate(requests):
            if r.want_greeks:
                out.append(PricingResult(float(prices[i]),
                                         float(gd[i]), float(gv[i])))
            else:
                out.append(PricingResult(float(prices[i])))
        return out


@dataclass
class ServerStats:
    requests: int = 0
    batches: int = 0
    errors: int = 0
    batch_sizes: List[int] = field(default_factory=list)

    @property
    def mean_batch(self) -> float:
        return (sum(self.batch_sizes) / len(self.batch_sizes)
                if self.batch_sizes else 0.0)

    def to_dict(self) -> dict:
        return {
            "requests": self.requests,
            "batches": self.batches,
            "errors": self.errors,
            "mean_batch_size": round(self.mean_batch, 2),
        }


class MicroBatchingServer:
    """Queue + dispatch thread turning concurrent callers into micro-batches.

    ``submit`` is thread-safe and returns a ``concurrent.futures.Future`` of
    a :class:`PricingResult`.  The dispatch loop collects up to ``max_batch``
    requests or waits at most ``max_wait_ms`` past the first request of a
    batch — the classic latency/throughput knob of serving systems.
    """

    def __init__(self, pricer: Optional[BatchPricer] = None,
                 max_batch: int = 2048, max_wait_ms: float = 2.0):
        self.pricer = pricer or BatchPricer()
        self.max_batch = int(max_batch)
        self.max_wait_s = float(max_wait_ms) / 1e3
        self.stats = ServerStats()
        self._queue: "queue.Queue" = queue.Queue()
        self._thread: Optional[threading.Thread] = None
        self._running = False

    # -- lifecycle ----------------------------------------------------------
    def start(self, warmup: bool = False) -> "MicroBatchingServer":
        if warmup:
            self.pricer.warmup()
        self._running = True
        self._thread = threading.Thread(target=self._loop, daemon=True,
                                        name="pricing-dispatch")
        self._thread.start()
        return self

    def stop(self) -> None:
        self._running = False
        if self._thread is not None:
            self._thread.join(timeout=10.0)
            self._thread = None
        # fail any stragglers rather than hanging their callers
        while True:
            try:
                _, fut = self._queue.get_nowait()
            except queue.Empty:
                break
            fut.set_exception(RuntimeError("pricing server stopped"))

    def __enter__(self):
        return self.start()

    def __exit__(self, *exc):
        self.stop()

    # -- client API ----------------------------------------------------------
    def submit(self, request: PricingRequest) -> "Future[PricingResult]":
        if not self._running:
            raise RuntimeError("server not started")
        fut: "Future[PricingResult]" = Future()
        self._queue.put((request, fut))
        return fut

    def price(self, request: PricingRequest,
              timeout: Optional[float] = 30.0) -> PricingResult:
        return self.submit(request).result(timeout=timeout)

    # -- dispatch loop --------------------------------------------------------
    def _drain_batch(self):
        try:
            first = self._queue.get(timeout=0.05)
        except queue.Empty:
            return []
        batch = [first]
        deadline = time.perf_counter() + self.max_wait_s
        while len(batch) < self.max_batch:
            remaining = deadline - time.perf_counter()
            if remaining <= 0:
                break
            try:
                batch.append(self._queue.get(timeout=remaining))
            except queue.Empty:
                break
        return batch

    def _loop(self):
        """One dispatch thread, deliberately synchronous.

        While ``pricer.price`` blocks on the device, arrivals pile up in the
        queue and the next drain takes them all — batch size self-adjusts to
        one client wave per device round-trip with no extra machinery.  A
        two-stage pipeline (launch thread + completion thread around
        ``price_async``/``finalize``) was measured on the remote-tunnelled
        v5e and LOST: with closed-loop callers it fragments each wave into
        cohorts, halving batch size, and closed-loop throughput is bounded
        by n_clients/RTT either way (sync hit that bound: 871 req/s at 32
        clients vs 447-474 for the pipelined variants).  Open-loop callers
        that want overlap can drive ``price_async`` directly."""
        while self._running:
            batch = self._drain_batch()
            if not batch:
                continue
            requests = [r for r, _ in batch]
            futures = [f for _, f in batch]
            try:
                results = self.pricer.price(requests)
            except Exception as exc:  # noqa: BLE001 — a bad batch must not
                # kill the dispatch thread; every caller sees the error
                self.stats.errors += len(batch)
                for fut in futures:
                    if not fut.done():
                        fut.set_exception(exc)
                continue
            for fut, res in zip(futures, results):
                fut.set_result(res)
            self.stats.requests += len(batch)
            self.stats.batches += 1
            self.stats.batch_sizes.append(len(batch))


_PRICING_SERVER_KEY = None


def pricing_server_key():
    """The aiohttp AppKey under which :func:`create_pricing_api` stores the
    server (lazy: aiohttp is an optional dependency)."""
    global _PRICING_SERVER_KEY
    from aiohttp import web

    if _PRICING_SERVER_KEY is None:
        _PRICING_SERVER_KEY = web.AppKey(
            "pricing_server", MicroBatchingServer
        )
    return _PRICING_SERVER_KEY


def create_pricing_api(server: Optional[MicroBatchingServer] = None):
    """aiohttp application exposing the micro-batching pricer.

    Routes (style-matched to the data service, pde_tpu/data/api.py):
      POST /price   {"requests": [{strike, maturity, spot, params, ...}]}
      GET  /stats   dispatch statistics
      GET  /health  liveness
    """
    from aiohttp import web

    srv = server or MicroBatchingServer().start()

    async def price(request):
        import asyncio

        try:
            body = await request.json()
            reqs = [
                PricingRequest(
                    strike=float(r["strike"]),
                    maturity=float(r["maturity"]),
                    spot=float(r["spot"]),
                    params=[float(x) for x in r["params"]],
                    rate=float(r.get("rate", 0.0)),
                    dividend=float(r.get("dividend", 0.0)),
                    is_call=bool(r.get("is_call", True)),
                    want_greeks=bool(r.get("want_greeks", False)),
                )
                for r in body["requests"]
            ]
        except (KeyError, TypeError, ValueError) as exc:
            return web.json_response({"error": f"bad request: {exc}"},
                                     status=400)
        futs = [srv.submit(r) for r in reqs]
        loop = asyncio.get_event_loop()
        results = await asyncio.gather(
            *[loop.run_in_executor(None, f.result, 30.0) for f in futs]
        )
        return web.json_response({"results": [r.to_dict() for r in results]})

    async def stats(request):
        return web.json_response(srv.stats.to_dict())

    async def health(request):
        return web.json_response({"status": "ok",
                                  "running": srv._running})

    app = web.Application()
    app.router.add_post("/price", price)
    app.router.add_get("/stats", stats)
    app.router.add_get("/health", health)
    app[pricing_server_key()] = srv
    return app


def run_server(host: str = "0.0.0.0", port: int = 8081,
               max_wait_ms: Optional[float] = None) -> None:
    """Serve the micro-batching pricer (container entrypoint,
    deploy/docker/Dockerfile.pricing).  Buckets are compiled before the
    socket opens so the first caller never pays an XLA compile."""
    import os

    from aiohttp import web

    wait = (float(os.environ.get("PDE_PRICING_MAX_WAIT_MS", 2.0))
            if max_wait_ms is None else max_wait_ms)
    srv = MicroBatchingServer(max_wait_ms=wait).start(warmup=True)
    try:
        web.run_app(create_pricing_api(srv), host=host, port=port)
    finally:
        srv.stop()

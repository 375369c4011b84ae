"""Micro-batching pricing service (pde_tpu/serving.py).

The reference has no pricing service — callers price in-process through the
OpenMP loop (src/cpp/models/heston.cpp:236-244).  These tests pin the three
properties a batching front end must have: (1) batched results are bit-exact
with direct single-quote pricing (padding is inert), (2) concurrent callers
are coalesced into few device calls, (3) one bad request cannot poison the
dispatch thread or other callers' results.
"""

import dataclasses
import threading
import time

import numpy as np
import pytest

from pde_tpu.models import heston
from pde_tpu.serving import (
    BatchPricer,
    MicroBatchingServer,
    PricingRequest,
)

PARAMS = (2.0, 0.04, 0.3, -0.7, 0.04)


def _requests(n=5):
    return [
        PricingRequest(
            strike=90.0 + 4 * i,
            maturity=0.5 + 0.1 * i,
            spot=100.0,
            params=PARAMS,
            rate=0.05,
            dividend=0.02,
            is_call=(i % 2 == 0),
        )
        for i in range(n)
    ]


class TestBatchPricer:
    def test_parity_with_direct_pricer_and_inert_padding(self):
        """A 5-request batch lands in the 8-bucket; the 3 padded slots must
        not perturb the real slots, and every price must match the direct
        scalar pricer to float64 round-off."""
        pricer = BatchPricer(buckets=(8, 32))
        reqs = _requests(5)
        res = pricer.price(reqs)
        p = heston.HestonParams(*PARAMS)
        for r, out in zip(reqs, res):
            direct = float(
                heston.price_carr_madan_gl(
                    p, r.strike, r.maturity, r.spot, r.rate, r.dividend,
                    r.is_call,
                )
            )
            assert out.price == pytest.approx(direct, abs=1e-9)
            assert out.delta is None  # greeks not requested

    def test_bucket_choice_does_not_change_prices(self):
        """The same request priced alone (bucket 8) and inside a 20-request
        batch (bucket 32) must agree exactly — shape buckets are a compile
        artifact, never a numerics knob."""
        pricer = BatchPricer(buckets=(8, 32))
        reqs = _requests(20)
        solo = pricer.price([reqs[0]])[0]
        batched = pricer.price(reqs)[0]
        assert solo.price == pytest.approx(batched.price, abs=1e-12)

    def test_greeks_match_finite_differences(self):
        pricer = BatchPricer(buckets=(8,))
        req = dataclasses.replace(_requests(1)[0], want_greeks=True)
        out = pricer.price([req])[0]
        p = heston.HestonParams(*PARAMS)

        def price_at(spot):
            return float(
                heston.price_carr_madan_gl(
                    p, req.strike, req.maturity, spot, req.rate,
                    req.dividend, req.is_call,
                )
            )

        eps = 1e-4
        fd_delta = (price_at(100.0 + eps) - price_at(100.0 - eps)) / (2 * eps)
        assert out.delta == pytest.approx(fd_delta, rel=1e-6)
        assert out.vega is not None and out.vega > 0.0

    def test_mixed_models_in_one_batch(self):
        """Each request carries its own parameter vector — one batch can
        span underlyings with different calibrations."""
        pricer = BatchPricer(buckets=(8,))
        alt = (3.0, 0.09, 0.5, -0.5, 0.09)
        reqs = [
            PricingRequest(100.0, 1.0, 100.0, PARAMS, rate=0.05),
            PricingRequest(100.0, 1.0, 100.0, alt, rate=0.05),
        ]
        res = pricer.price(reqs)
        p0 = float(heston.price_carr_madan_gl(
            heston.HestonParams(*PARAMS), 100.0, 1.0, 100.0, 0.05, 0.0, True))
        p1 = float(heston.price_carr_madan_gl(
            heston.HestonParams(*alt), 100.0, 1.0, 100.0, 0.05, 0.0, True))
        assert res[0].price == pytest.approx(p0, abs=1e-9)
        assert res[1].price == pytest.approx(p1, abs=1e-9)
        assert abs(p0 - p1) > 1e-3  # genuinely different models

    def test_empty_batch(self):
        assert BatchPricer(buckets=(8,)).price([]) == []


class TestMicroBatchingServer:
    def test_concurrent_callers_are_coalesced(self):
        """A burst of concurrent submissions must execute in far fewer
        device calls than requests (that is the point of the server)."""
        srv = MicroBatchingServer(
            BatchPricer(buckets=(8, 32)), max_wait_ms=50.0
        )
        reqs = _requests(5)
        expected = BatchPricer(buckets=(8, 32)).price(reqs)
        with srv:
            futs = [srv.submit(r) for r in reqs * 4]
            out = [f.result(timeout=60.0) for f in futs]
        assert srv.stats.requests == 20
        assert srv.stats.batches <= 3  # 20 requests, not 20 batches
        for got, want in zip(out, expected * 4):
            assert got.price == pytest.approx(want.price, abs=1e-12)

    def test_bad_request_fails_its_caller_not_the_server(self):
        srv = MicroBatchingServer(BatchPricer(buckets=(8,)), max_wait_ms=1.0)
        with srv:
            bad = PricingRequest(100.0, 1.0, 100.0, params=(1.0, 2.0))  # len 2
            with pytest.raises(Exception):
                srv.submit(bad).result(timeout=60.0)
            # dispatch thread survived: a good request still prices
            good = srv.submit(_requests(1)[0]).result(timeout=60.0)
            assert good.price > 0.0
            assert srv.stats.errors >= 1

    def test_stop_fails_queued_stragglers(self):
        srv = MicroBatchingServer(BatchPricer(buckets=(8,)))
        srv.start()
        srv._running = False  # freeze dispatch before it can drain
        srv._thread.join(timeout=5.0)
        srv._thread = None
        srv._running = True  # allow submit
        fut_ok = srv.submit(_requests(1)[0])
        srv._running = False
        srv.stop()
        with pytest.raises(RuntimeError, match="stopped"):
            fut_ok.result(timeout=1.0)

    def test_submit_before_start_raises(self):
        srv = MicroBatchingServer(BatchPricer(buckets=(8,)))
        with pytest.raises(RuntimeError):
            srv.submit(_requests(1)[0])


class TestCLIWiring:
    def test_serve_subcommand_registered(self):
        from pde_tpu.cli import build_parser, cmd_serve

        args = build_parser().parse_args(
            ["serve", "--port", "9000", "--max-wait-ms", "5"]
        )
        assert args.func is cmd_serve
        assert args.port == 9000
        assert args.max_wait_ms == 5.0


class TestPricingAPI:
    def test_http_roundtrip(self):
        pytest.importorskip("aiohttp")
        import asyncio

        from aiohttp.test_utils import TestClient, TestServer

        from pde_tpu.serving import create_pricing_api

        srv = MicroBatchingServer(BatchPricer(buckets=(8,)), max_wait_ms=1.0)
        srv.start()

        from pde_tpu.serving import pricing_server_key

        async def scenario():
            app = create_pricing_api(srv)
            assert app[pricing_server_key()] is srv
            async with TestClient(TestServer(app)) as client:
                r = await client.get("/health")
                assert r.status == 200

                r = await client.post("/price", json={"requests": [
                    {"strike": 100.0, "maturity": 1.0, "spot": 100.0,
                     "params": list(PARAMS), "rate": 0.05},
                    {"strike": 110.0, "maturity": 1.0, "spot": 100.0,
                     "params": list(PARAMS), "rate": 0.05,
                     "want_greeks": True},
                ]})
                assert r.status == 200
                body = await r.json()
                assert len(body["results"]) == 2
                assert body["results"][0]["price"] > 0
                assert "delta" in body["results"][1]

                r = await client.post("/price", json={"nope": 1})
                assert r.status == 400

                r = await client.get("/stats")
                assert (await r.json())["requests"] >= 2

        try:
            asyncio.run(scenario())
        finally:
            srv.stop()

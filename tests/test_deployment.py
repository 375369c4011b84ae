"""Deployment + documentation structural tests.

The reference tests deployment correctness *statically* by parsing manifests
and asserting invariants (tests/python/deployment/test_deployment.py:33-371)
and guards documentation drift (test_documentation.py) — same strategy here.
"""

import json
import re
from pathlib import Path

import pytest
import yaml

ROOT = Path(__file__).resolve().parents[1]


class TestDockerfile:
    @pytest.fixture(scope="class")
    def dockerfile(self):
        return (ROOT / "deploy" / "docker" / "Dockerfile").read_text()

    def test_non_root_user(self, dockerfile):
        assert "USER app" in dockerfile
        assert "useradd" in dockerfile

    def test_healthcheck_present(self, dockerfile):
        assert "HEALTHCHECK" in dockerfile

    def test_no_hardcoded_secrets(self, dockerfile):
        assert not re.search(r"(PASSWORD|SECRET|API_KEY)\s*=", dockerfile, re.IGNORECASE)


class TestCompose:
    @pytest.fixture(scope="class")
    def compose(self):
        return yaml.safe_load((ROOT / "deploy" / "docker" / "docker-compose.yml").read_text())

    def test_services_present(self, compose):
        assert {"data-api", "prometheus", "grafana"} <= set(compose["services"])

    def test_restart_policies(self, compose):
        for name, svc in compose["services"].items():
            assert svc.get("restart") == "unless-stopped", name

    def test_grafana_password_via_secret(self, compose):
        g = compose["services"]["grafana"]
        env = g.get("environment", {})
        assert all("PASSWORD" not in str(v).upper() or "FILE" in k
                   for k, v in env.items())
        assert "secrets" in g


class TestK8s:
    @pytest.fixture(scope="class")
    def manifests(self):
        docs = []
        for path in (ROOT / "deploy" / "k8s" / "base").glob("*.yaml"):
            docs.extend(d for d in yaml.safe_load_all(path.read_text()) if d)
        return docs

    def test_deployment_has_probes_and_limits(self, manifests):
        deployments = [d for d in manifests if d["kind"] == "Deployment"]
        assert deployments
        for d in deployments:
            containers = d["spec"]["template"]["spec"]["containers"]
            for c in containers:
                assert "livenessProbe" in c, d["metadata"]["name"]
                assert "readinessProbe" in c
                assert "limits" in c["resources"]

    def test_non_root_security_context(self, manifests):
        for d in manifests:
            if d["kind"] == "Deployment":
                sc = d["spec"]["template"]["spec"].get("securityContext", {})
                assert sc.get("runAsNonRoot") is True

    def test_calibration_cronjob_requests_tpu(self, manifests):
        jobs = [d for d in manifests if d["kind"] == "CronJob"]
        assert jobs
        c = jobs[0]["spec"]["jobTemplate"]["spec"]["template"]["spec"]["containers"][0]
        assert "google.com/tpu" in c["resources"]["requests"]

    def test_no_hardcoded_secrets(self, manifests):
        text = json.dumps(manifests)
        assert "password" not in text.lower()


class TestPrometheus:
    def test_scrape_config(self):
        cfg = yaml.safe_load(
            (ROOT / "deploy" / "docker" / "prometheus" / "prometheus.yml").read_text()
        )
        assert cfg["scrape_configs"][0]["job_name"] == "pde-tpu"


class TestDocumentation:
    REQUIRED = ["README.md", "SURVEY.md", "BASELINE.md", "docs/architecture.md",
                "sql/schema.sql", "config/default.json", "Makefile"]

    def test_required_docs_exist(self):
        for rel in self.REQUIRED:
            assert (ROOT / rel).exists(), rel

    def test_readme_mentions_entry_points(self):
        readme = (ROOT / "README.md").read_text()
        for token in ("bench.py", "pytest", "pde_tpu.cli"):
            assert token in readme, token

    def test_architecture_doc_layer_map(self):
        doc = (ROOT / "docs" / "architecture.md").read_text()
        for token in ("Layer map", "Scaling model", "Correctness strategy"):
            assert token in doc

    def test_default_config_parses(self):
        from pde_tpu.core.config import Config

        cfg = Config.from_file(str(ROOT / "config" / "default.json"))
        assert cfg.trading.initial_capital > 0

    def test_schema_sql_matches_runtime_schema(self):
        """Every table created by the runtime exists in the exported DDL."""
        sql = (ROOT / "sql" / "schema.sql").read_text()
        from pde_tpu.database import TimeSeriesDB
        from pde_tpu.database.migrations import MigrationRunner

        db = TimeSeriesDB(":memory:")
        MigrationRunner(db).upgrade()
        tables = [
            r[0] for r in db._conn().execute(
                "SELECT name FROM sqlite_master WHERE type='table'"
            ).fetchall()
            if not r[0].startswith("sqlite_") and r[0] != "schema_version"
        ]
        for t in tables:
            assert t in sql, f"table {t} missing from sql/schema.sql"

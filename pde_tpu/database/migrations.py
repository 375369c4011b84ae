"""Versioned schema migrations.

The reference manages schema with Alembic + raw SQL (alembic/versions/,
sql/schema.sql).  This is the portable analog: ordered migrations applied
against a ``schema_version`` table, idempotent and forward-only (the standard
production posture — downgrade = restore from backup).
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import datetime, timezone
from typing import Callable, Dict, List

__all__ = ["Migration", "MigrationRunner", "MIGRATIONS"]


@dataclass
class Migration:
    version: int
    name: str
    sql: str


# The baseline schema ships in database/db.py (v1); migrations evolve it.
MIGRATIONS: List[Migration] = [
    Migration(
        2,
        "add_calibration_runs",
        """
        CREATE TABLE IF NOT EXISTS calibration_runs (
            run_id INTEGER PRIMARY KEY AUTOINCREMENT,
            time TEXT NOT NULL,
            underlying TEXT NOT NULL,
            status TEXT NOT NULL,
            n_options INTEGER,
            errors TEXT,
            run_time_s REAL
        );
        CREATE INDEX IF NOT EXISTS idx_calruns ON calibration_runs (underlying, time);
        """,
    ),
    Migration(
        3,
        "add_fills_table",
        """
        CREATE TABLE IF NOT EXISTS fills (
            fill_id TEXT PRIMARY KEY,
            order_id TEXT NOT NULL,
            time TEXT NOT NULL,
            symbol TEXT NOT NULL,
            side TEXT NOT NULL,
            quantity REAL NOT NULL,
            price REAL NOT NULL,
            commission REAL DEFAULT 0,
            venue TEXT
        );
        CREATE INDEX IF NOT EXISTS idx_fills_order ON fills (order_id);
        """,
    ),
    Migration(
        4,
        "add_equity_curve",
        """
        CREATE TABLE IF NOT EXISTS equity_curve (
            time TEXT NOT NULL PRIMARY KEY,
            equity REAL NOT NULL,
            cash REAL,
            gross_exposure REAL
        );
        """,
    ),
]


class MigrationRunner:
    """Applies pending migrations in order (the alembic-upgrade analog)."""

    def __init__(self, db):
        self.db = db
        self._ensure_version_table()

    def _ensure_version_table(self) -> None:
        con = self.db._conn()
        with self.db._lock, con:
            con.execute(
                "CREATE TABLE IF NOT EXISTS schema_version ("
                " version INTEGER PRIMARY KEY, name TEXT, applied_at TEXT)"
            )
            if con.execute("SELECT COUNT(*) FROM schema_version").fetchone()[0] == 0:
                con.execute(
                    "INSERT INTO schema_version VALUES (1, 'baseline', ?)",
                    (datetime.now(timezone.utc).isoformat(),),
                )

    @property
    def current_version(self) -> int:
        con = self.db._conn()
        return con.execute("SELECT MAX(version) FROM schema_version").fetchone()[0]

    def pending(self) -> List[Migration]:
        v = self.current_version
        return [m for m in sorted(MIGRATIONS, key=lambda m: m.version) if m.version > v]

    def upgrade(self) -> List[int]:
        """Apply all pending migrations; returns applied versions."""
        applied = []
        con = self.db._conn()
        for m in self.pending():
            with self.db._lock, con:
                con.executescript(m.sql)
                con.execute(
                    "INSERT INTO schema_version VALUES (?, ?, ?)",
                    (m.version, m.name, datetime.now(timezone.utc).isoformat()),
                )
            applied.append(m.version)
        return applied

    def history(self) -> List[Dict]:
        con = self.db._conn()
        rows = con.execute(
            "SELECT version, name, applied_at FROM schema_version ORDER BY version"
        ).fetchall()
        return [{"version": r[0], "name": r[1], "applied_at": r[2]} for r in rows]

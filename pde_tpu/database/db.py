"""Time-series persistence: the TimeSeriesDB facade.

Mirrors the reference database layer (database/db.py + database/models.py):
market prices, option quotes, model parameters (JSON payloads keyed by
(time, model_type, underlying, maturity) — database/models.py:311), signals,
and the position lifecycle with update trail (:538-897), plus retries and a
health check (:48-146, :922).

Storage engine: stdlib ``sqlite3``.  The reference runs TimescaleDB in
production but its entire test-suite substitutes SQLite via cross-dialect
TypeDecorators (SURVEY.md section 4) — this build makes the portable engine
first-class; a server-backed engine can implement the same facade.
WAL mode + indexed (time, key) columns stand in for hypertables.
"""

from __future__ import annotations

import json
import sqlite3
import threading
import time as _time
from datetime import datetime, timezone
from typing import Any, Dict, List, Optional

__all__ = ["TimeSeriesDB", "retry"]

_SCHEMA = """
CREATE TABLE IF NOT EXISTS market_prices (
    time TEXT NOT NULL,
    symbol TEXT NOT NULL,
    open REAL, high REAL, low REAL, close REAL NOT NULL, volume REAL,
    PRIMARY KEY (time, symbol)
);
CREATE INDEX IF NOT EXISTS idx_prices_symbol_time ON market_prices (symbol, time);

CREATE TABLE IF NOT EXISTS option_quotes (
    time TEXT NOT NULL,
    underlying TEXT NOT NULL,
    strike REAL NOT NULL,
    expiration TEXT NOT NULL,
    option_type TEXT NOT NULL,
    bid REAL, ask REAL, last REAL, volume INTEGER, open_interest INTEGER,
    implied_vol REAL,
    PRIMARY KEY (time, underlying, strike, expiration, option_type)
);
CREATE INDEX IF NOT EXISTS idx_options_underlying ON option_quotes (underlying, time);

CREATE TABLE IF NOT EXISTS model_parameters (
    time TEXT NOT NULL,
    model_type TEXT NOT NULL,
    underlying TEXT NOT NULL,
    maturity REAL,
    parameters TEXT NOT NULL,
    fit_quality TEXT,
    converged INTEGER NOT NULL DEFAULT 1,
    calibration_time_ms INTEGER
);
CREATE INDEX IF NOT EXISTS idx_params_lookup
    ON model_parameters (model_type, underlying, time);

CREATE TABLE IF NOT EXISTS signals (
    time TEXT NOT NULL,
    asset TEXT NOT NULL,
    strategy TEXT NOT NULL,
    signal_type TEXT NOT NULL,
    confidence REAL,
    payload TEXT
);
CREATE INDEX IF NOT EXISTS idx_signals_asset ON signals (asset, time);

CREATE TABLE IF NOT EXISTS positions (
    position_id INTEGER PRIMARY KEY AUTOINCREMENT,
    symbol TEXT NOT NULL,
    direction TEXT NOT NULL,
    quantity REAL NOT NULL,
    entry_price REAL NOT NULL,
    entry_time TEXT NOT NULL,
    exit_price REAL,
    exit_time TEXT,
    status TEXT NOT NULL DEFAULT 'open',
    strategy TEXT,
    metadata TEXT
);

CREATE TABLE IF NOT EXISTS position_updates (
    position_id INTEGER NOT NULL,
    time TEXT NOT NULL,
    price REAL NOT NULL,
    unrealized_pnl REAL,
    note TEXT
);
"""


def retry(n_attempts: int = 3, delay: float = 0.05):
    """Retry-with-backoff decorator (database/db.py:48-81)."""

    def wrap(fn):
        def inner(*args, **kwargs):
            last = None
            for attempt in range(n_attempts):
                try:
                    return fn(*args, **kwargs)
                except sqlite3.OperationalError as exc:  # lock contention etc.
                    last = exc
                    _time.sleep(delay * (2**attempt))
            raise last

        return inner

    return wrap


def _iso(ts) -> str:
    if isinstance(ts, str):
        return ts
    if isinstance(ts, datetime):
        return ts.isoformat()
    return datetime.now(timezone.utc).isoformat()


class TimeSeriesDB:
    """Facade over the persistence layer (database/db.py:82-950).

    Thread-safe: one connection per thread, WAL journal.
    """

    def __init__(self, path: str = ":memory:"):
        self.path = self._normalize_path(path)
        path = self.path
        self._local = threading.local()
        # for :memory:, every connection is a separate database; share one
        self._shared = sqlite3.connect(path, check_same_thread=False) if path == ":memory:" else None
        self._lock = threading.Lock()
        with self._conn() as con:
            con.executescript(_SCHEMA)
            if path != ":memory:":
                con.execute("PRAGMA journal_mode=WAL")

    @staticmethod
    def _normalize_path(path: str) -> str:
        """Accept a filesystem path or a sqlite URL (reference db.py:82-146
        takes SQLAlchemy URLs).  ``sqlite:`` / ``sqlite://`` map to
        ``:memory:``; ``sqlite:///rel`` and ``sqlite:////abs`` strip to the
        file path.  Any other URL scheme is rejected instead of silently
        creating a file literally named after the URL."""
        if path.startswith("sqlite:"):
            rest = path[len("sqlite:"):].lstrip("/") if path not in ("sqlite:", "sqlite://") else ""
            if path.startswith("sqlite:////"):
                rest = "/" + rest
            return rest or ":memory:"
        if "://" in path:
            raise ValueError(
                f"TimeSeriesDB takes a sqlite path or sqlite:// URL, got {path!r}"
            )
        return path

    def _conn(self) -> sqlite3.Connection:
        if self._shared is not None:
            return self._shared
        con = getattr(self._local, "con", None)
        if con is None:
            con = sqlite3.connect(self.path)
            con.row_factory = sqlite3.Row
            self._local.con = con
        return con

    # ------------------------------------------------------------- prices

    @retry()
    def insert_market_prices(self, rows: List[Dict[str, Any]]) -> int:
        with self._lock, self._conn() as con:
            con.executemany(
                "INSERT OR REPLACE INTO market_prices (time, symbol, open, high, low, close, volume)"
                " VALUES (?, ?, ?, ?, ?, ?, ?)",
                [
                    (
                        _iso(r["time"]), r["symbol"], r.get("open"), r.get("high"),
                        r.get("low"), r["close"], r.get("volume"),
                    )
                    for r in rows
                ],
            )
        return len(rows)

    @retry()
    def query_market_prices(
        self, symbol: str, start: Optional[str] = None, end: Optional[str] = None
    ) -> List[Dict[str, Any]]:
        q = "SELECT * FROM market_prices WHERE symbol = ?"
        args: List[Any] = [symbol]
        if start:
            q += " AND time >= ?"
            args.append(_iso(start))
        if end:
            q += " AND time <= ?"
            args.append(_iso(end))
        q += " ORDER BY time"
        con = self._conn()
        con.row_factory = sqlite3.Row
        return [dict(r) for r in con.execute(q, args).fetchall()]

    # ------------------------------------------------------------- options

    @retry()
    def insert_option_quotes(self, rows: List[Dict[str, Any]]) -> int:
        with self._lock, self._conn() as con:
            con.executemany(
                "INSERT OR REPLACE INTO option_quotes"
                " (time, underlying, strike, expiration, option_type, bid, ask, last,"
                "  volume, open_interest, implied_vol)"
                " VALUES (?, ?, ?, ?, ?, ?, ?, ?, ?, ?, ?)",
                [
                    (
                        _iso(r["time"]), r["underlying"], r["strike"], str(r["expiration"]),
                        r["option_type"], r.get("bid"), r.get("ask"), r.get("last"),
                        r.get("volume"), r.get("open_interest"), r.get("implied_vol"),
                    )
                    for r in rows
                ],
            )
        return len(rows)

    @retry()
    def query_option_chain(self, underlying: str, time: Optional[str] = None) -> List[Dict[str, Any]]:
        con = self._conn()
        con.row_factory = sqlite3.Row
        if time is None:
            row = con.execute(
                "SELECT MAX(time) AS t FROM option_quotes WHERE underlying = ?", (underlying,)
            ).fetchone()
            time = row["t"] if row else None
            if time is None:
                return []
        return [
            dict(r)
            for r in con.execute(
                "SELECT * FROM option_quotes WHERE underlying = ? AND time = ?"
                " ORDER BY expiration, strike",
                (underlying, _iso(time)),
            ).fetchall()
        ]

    # --------------------------------------------------------- model params

    @retry()
    def store_model_parameters(
        self,
        model_type: str,
        underlying: str,
        parameters: Dict[str, Any],
        fit_quality: Optional[Dict[str, Any]] = None,
        maturity: Optional[float] = None,
        converged: bool = True,
        calibration_time_ms: Optional[int] = None,
        time: Optional[datetime] = None,
    ) -> None:
        """Parameter store keyed like database/models.py:311."""
        with self._lock, self._conn() as con:
            con.execute(
                "INSERT INTO model_parameters"
                " (time, model_type, underlying, maturity, parameters, fit_quality,"
                "  converged, calibration_time_ms) VALUES (?, ?, ?, ?, ?, ?, ?, ?)",
                (
                    _iso(time), model_type, underlying, maturity,
                    json.dumps(parameters), json.dumps(fit_quality or {}),
                    int(converged), calibration_time_ms,
                ),
            )

    @retry()
    def get_latest_model_parameters(
        self, model_type: str, underlying: str, maturity: Optional[float] = None
    ) -> Optional[Dict[str, Any]]:
        con = self._conn()
        con.row_factory = sqlite3.Row
        q = (
            "SELECT * FROM model_parameters WHERE model_type = ? AND underlying = ?"
            + (" AND maturity IS NULL" if maturity is None else " AND maturity = ?")
            + " ORDER BY time DESC LIMIT 1"
        )
        args = [model_type, underlying] + ([] if maturity is None else [maturity])
        row = con.execute(q, args).fetchone()
        if row is None:
            return None
        return {
            "time": row["time"],
            "model_type": row["model_type"],
            "underlying": row["underlying"],
            "maturity": row["maturity"],
            "parameters": json.loads(row["parameters"]),
            "fit_quality": json.loads(row["fit_quality"] or "{}"),
            "converged": bool(row["converged"]),
            "calibration_time_ms": row["calibration_time_ms"],
        }

    @retry()
    def get_parameter_history(
        self, model_type: str, underlying: str, limit: int = 100
    ) -> List[Dict[str, Any]]:
        con = self._conn()
        con.row_factory = sqlite3.Row
        rows = con.execute(
            "SELECT * FROM model_parameters WHERE model_type = ? AND underlying = ?"
            " ORDER BY time DESC LIMIT ?",
            (model_type, underlying, limit),
        ).fetchall()
        return [
            {**dict(r), "parameters": json.loads(r["parameters"]),
             "fit_quality": json.loads(r["fit_quality"] or "{}")}
            for r in rows
        ]

    # ------------------------------------------------------------- signals

    @retry()
    def store_signal(
        self, asset: str, strategy: str, signal_type: str,
        confidence: float = 0.0, payload: Optional[Dict] = None,
        time: Optional[datetime] = None,
    ) -> None:
        with self._lock, self._conn() as con:
            con.execute(
                "INSERT INTO signals (time, asset, strategy, signal_type, confidence, payload)"
                " VALUES (?, ?, ?, ?, ?, ?)",
                (_iso(time), asset, strategy, signal_type, confidence, json.dumps(payload or {})),
            )

    @retry()
    def query_signals(self, asset: Optional[str] = None, limit: int = 100) -> List[Dict[str, Any]]:
        con = self._conn()
        con.row_factory = sqlite3.Row
        if asset:
            rows = con.execute(
                "SELECT * FROM signals WHERE asset = ? ORDER BY time DESC LIMIT ?", (asset, limit)
            ).fetchall()
        else:
            rows = con.execute("SELECT * FROM signals ORDER BY time DESC LIMIT ?", (limit,)).fetchall()
        return [{**dict(r), "payload": json.loads(r["payload"] or "{}")} for r in rows]

    # ------------------------------------------------------------ positions

    @retry()
    def open_position(
        self, symbol: str, direction: str, quantity: float, entry_price: float,
        strategy: Optional[str] = None, entry_time: Optional[datetime] = None,
        metadata: Optional[Dict] = None,
    ) -> int:
        with self._lock, self._conn() as con:
            cur = con.execute(
                "INSERT INTO positions (symbol, direction, quantity, entry_price,"
                " entry_time, status, strategy, metadata) VALUES (?, ?, ?, ?, ?, 'open', ?, ?)",
                (symbol, direction, quantity, entry_price, _iso(entry_time), strategy,
                 json.dumps(metadata or {})),
            )
            return int(cur.lastrowid)

    @retry()
    def update_position(
        self, position_id: int, price: float, unrealized_pnl: Optional[float] = None,
        note: str = "", time: Optional[datetime] = None,
    ) -> None:
        with self._lock, self._conn() as con:
            con.execute(
                "INSERT INTO position_updates (position_id, time, price, unrealized_pnl, note)"
                " VALUES (?, ?, ?, ?, ?)",
                (position_id, _iso(time), price, unrealized_pnl, note),
            )

    @retry()
    def close_position(
        self, position_id: int, exit_price: float, exit_time: Optional[datetime] = None
    ) -> None:
        with self._lock, self._conn() as con:
            con.execute(
                "UPDATE positions SET exit_price = ?, exit_time = ?, status = 'closed'"
                " WHERE position_id = ?",
                (exit_price, _iso(exit_time), position_id),
            )

    @retry()
    def get_open_positions(self) -> List[Dict[str, Any]]:
        con = self._conn()
        con.row_factory = sqlite3.Row
        rows = con.execute("SELECT * FROM positions WHERE status = 'open'").fetchall()
        return [dict(r) for r in rows]

    @retry()
    def get_position_history(self, position_id: int) -> List[Dict[str, Any]]:
        con = self._conn()
        con.row_factory = sqlite3.Row
        rows = con.execute(
            "SELECT * FROM position_updates WHERE position_id = ? ORDER BY time", (position_id,)
        ).fetchall()
        return [dict(r) for r in rows]

    # -------------------------------------------------------------- health

    def health_check(self) -> Dict[str, Any]:
        """Liveness probe (database/db.py:922-950)."""
        try:
            t0 = _time.perf_counter()
            self._conn().execute("SELECT 1").fetchone()
            return {
                "healthy": True,
                "latency_ms": (_time.perf_counter() - t0) * 1000.0,
                "engine": "sqlite3",
                "path": self.path,
            }
        except Exception as exc:  # noqa: BLE001
            return {"healthy": False, "error": str(exc)}

    # ------------------------------------------------------- backup/restore

    def backup(self, dest_path: str) -> Dict[str, Any]:
        """Online backup to ``dest_path`` via sqlite's backup API.

        Mirrors the reference's ops-level backup posture
        (deploy/scripts/backup.sh, WAL archiving + pg_dump): a WAL
        checkpoint followed by a consistent point-in-time copy, safe to run
        while readers/writers are active.
        """
        src = self._conn()
        src.execute("PRAGMA wal_checkpoint(TRUNCATE)")
        with self._lock:
            dst = sqlite3.connect(dest_path)
            try:
                src.backup(dst)
                n_tables = dst.execute(
                    "SELECT COUNT(*) FROM sqlite_master WHERE type='table'"
                ).fetchone()[0]
            finally:
                dst.close()
        return {"path": dest_path, "tables": n_tables,
                "time": datetime.now(timezone.utc).isoformat()}

    def restore(self, src_path: str) -> Dict[str, Any]:
        """Replace this database's contents from a backup file
        (reference docs/DATABASE_RECOVERY.md posture; SURVEY.md §5)."""
        src = sqlite3.connect(src_path)
        try:
            with self._lock:
                dst = self._conn()
                src.backup(dst)
                n = dst.execute(
                    "SELECT COUNT(*) FROM sqlite_master WHERE type='table'"
                ).fetchone()[0]
        finally:
            src.close()
        return {"restored_from": src_path, "tables": n}

    def close(self) -> None:
        if self._shared is not None:
            self._shared.close()
        con = getattr(self._local, "con", None)
        if con is not None:
            con.close()

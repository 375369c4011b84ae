-- pde_tpu canonical schema (the authoritative DDL lives in
-- pde_tpu/database/db.py and evolves via pde_tpu/database/migrations.py;
-- this file is the human-readable export, the analog of the reference's
-- sql/schema.sql).  Dialect: SQLite-compatible SQL; a TimescaleDB deployment
-- adds hypertables on the time columns.

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

-- model parameters keyed by (time, model_type, underlying, maturity)
CREATE TABLE IF NOT EXISTS model_parameters (
    time TEXT NOT NULL,
    model_type TEXT NOT NULL,
    underlying TEXT NOT NULL,
    maturity REAL,
    parameters TEXT NOT NULL,        -- JSON
    fit_quality TEXT,                -- JSON
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
    payload TEXT                     -- JSON
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
    metadata TEXT                    -- JSON
);

CREATE TABLE IF NOT EXISTS position_updates (
    position_id INTEGER NOT NULL,
    time TEXT NOT NULL,
    price REAL NOT NULL,
    unrealized_pnl REAL,
    note TEXT
);

-- migration v2
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

-- migration v3
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

-- migration v4
CREATE TABLE IF NOT EXISTS equity_curve (
    time TEXT NOT NULL PRIMARY KEY,
    equity REAL NOT NULL,
    cash REAL,
    gross_exposure REAL
);

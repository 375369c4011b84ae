#!/usr/bin/env bash
# Restore the pde_tpu sqlite store from a backup produced by backup.sh.
#
# Counterpart of the reference's docs/DATABASE_RECOVERY.md procedure: stop
# writers, restore the point-in-time copy, verify integrity, restart.
# See docs/database_recovery.md for the full runbook.
#
# Usage: restore.sh BACKUP_FILE [DB_PATH]
set -euo pipefail

BACKUP="${1:?usage: restore.sh BACKUP_FILE [DB_PATH]}"
DB_PATH="${2:-${PDE_DB_PATH:-pde_tpu.db}}"

[ -f "$BACKUP" ] || { echo "no backup at $BACKUP" >&2; exit 1; }

TMP="$(mktemp)"
case "$BACKUP" in
  *.gz) gunzip -c "$BACKUP" > "$TMP" ;;
  *)    cp "$BACKUP" "$TMP" ;;
esac

python3 - "$TMP" <<'EOF' || { rm -f "$TMP"; exit 1; }
import sqlite3, sys
try:
    con = sqlite3.connect(sys.argv[1])
    ok = con.execute("PRAGMA integrity_check").fetchone()[0]
    con.close()
except sqlite3.Error as exc:
    sys.exit(f"backup is not a valid sqlite database: {exc}")
if ok != "ok":
    sys.exit("backup failed integrity check")
EOF

# preserve the current db (if any) before overwriting
if [ -f "$DB_PATH" ]; then
  mv "$DB_PATH" "${DB_PATH}.pre-restore.$(date -u +%Y%m%dT%H%M%SZ)"
  rm -f "${DB_PATH}-wal" "${DB_PATH}-shm"
fi
mv "$TMP" "$DB_PATH"

echo "restored $DB_PATH from $BACKUP"

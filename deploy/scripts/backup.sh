#!/usr/bin/env bash
# Consistent online backup of the pde_tpu sqlite store.
#
# Mirrors the reference's deploy/scripts/backup.sh (pg_dump + WAL archiving)
# in the sqlite deployment posture: checkpoint the WAL, then take a
# point-in-time copy with sqlite's online backup API, then prune old
# backups. Safe to run while the trading system is live. Uses python3's
# sqlite3 module so no sqlite CLI is required on the host.
#
# Usage: backup.sh [DB_PATH] [BACKUP_DIR]
set -euo pipefail

DB_PATH="${1:-${PDE_DB_PATH:-pde_tpu.db}}"
BACKUP_DIR="${2:-${PDE_BACKUP_DIR:-backups}}"
RETAIN="${PDE_BACKUP_RETAIN:-14}"

[ -f "$DB_PATH" ] || { echo "no database at $DB_PATH" >&2; exit 1; }
mkdir -p "$BACKUP_DIR"

STAMP="$(date -u +%Y%m%dT%H%M%SZ)"
OUT="$BACKUP_DIR/pde_tpu_${STAMP}.db"

python3 - "$DB_PATH" "$OUT" <<'EOF'
import sqlite3, sys
src_path, out_path = sys.argv[1], sys.argv[2]
src = sqlite3.connect(src_path)
src.execute("PRAGMA wal_checkpoint(TRUNCATE)")
dst = sqlite3.connect(out_path)
src.backup(dst)
ok = dst.execute("PRAGMA integrity_check").fetchone()[0]
dst.close(); src.close()
if ok != "ok":
    sys.exit(f"backup failed integrity check: {out_path}")
EOF
gzip -f "$OUT"

# prune: keep the newest $RETAIN backups
ls -1t "$BACKUP_DIR"/pde_tpu_*.db.gz 2>/dev/null | tail -n "+$((RETAIN + 1))" \
  | xargs -r rm -f

echo "backup written: ${OUT}.gz"

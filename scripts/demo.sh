#!/bin/bash
# End-to-end REST walkthrough of the graft control plane — the analog of
# the reference's demo/demo.sh + demo/fault-tolerance-demo.sh, driven
# against the real engine (graft.Serve boots Spark + the lake log + the
# REST transport in one process; no docker compose needed).
#
#   scripts/demo.sh            # starts its own server, runs, cleans up
#   GRAFT_DEMO_PORT=9090 scripts/demo.sh
#
# Walkthrough: create table -> insert two batches -> SQL queries (scan,
# filter, aggregate) -> table metadata + version history -> time-travel
# reads (VERSION AS OF) -> merge-on-read DELETE -> OPTIMIZE compaction ->
# an idempotent commit retry (the single-process analog of the reference's
# kill-the-leader-and-retry demo: replaying a txn_id must not double-
# commit) -> RESTORE -> tags/branches -> write-audit-publish -> a
# cross-table 2PC transaction -> REAL fault injection (SIGKILL the
# server with a staged batch + in-flight query, restart on the same lake
# dir, verify data intact / txn replay exactly-once across process death
# / orphaned staging vacuumed). Exits non-zero on the first failed step.

set -euo pipefail
cd "$(dirname "$0")/.."

PORT="${GRAFT_DEMO_PORT:-8081}"
BASE="http://127.0.0.1:$PORT"
TABLE="sales_data"
LAKE_DIR="$(mktemp -d /tmp/graft-demo-XXXX)"
SERVER_LOG="$LAKE_DIR/server.log"

for tool in curl jq; do
  command -v "$tool" >/dev/null || { echo "ERROR: $tool required"; exit 1; }
done

echo "=== graft demo ==="
echo "server: $BASE   lake: $LAKE_DIR"

SPARK_GRAFT_PORT="$PORT" SPARK_GRAFT_LAKE_DIR="$LAKE_DIR" \
  SPARK_GRAFT_CPUS=8 \
  sbt -batch "runMain graft.Serve" >"$SERVER_LOG" 2>&1 &
SBT_PID=$!
cleanup() {
  # kill the whole process group sbt forked (sbt -> forked JVM)
  kill "$SBT_PID" 2>/dev/null || true
  pkill -f "graft.Serve" 2>/dev/null || true
  # the forked JVM's argv is `java @argfile` — pkill -f misses it; an
  # orphan keeps the port (and its stale tables) for the NEXT demo run,
  # which then fails on CREATE TABLE. Kill whoever still holds the port.
  SRV=$(ss -ltnp 2>/dev/null | grep ":$PORT " | grep -oE 'pid=[0-9]+' \
    | head -1 | cut -d= -f2)
  [ -n "${SRV:-}" ] && kill "$SRV" 2>/dev/null || true
  wait "$SBT_PID" 2>/dev/null || true
}
trap cleanup EXIT

echo "waiting for the server..."
for i in $(seq 1 60); do
  if curl -sf "$BASE/health" >/dev/null 2>&1; then break; fi
  if ! kill -0 "$SBT_PID" 2>/dev/null; then
    echo "ERROR: server process died; tail of $SERVER_LOG:"
    tail -20 "$SERVER_LOG"; exit 1
  fi
  sleep 3
  [ "$i" = 60 ] && { echo "ERROR: server not ready after 180s"; exit 1; }
done
curl -s "$BASE/health" | jq .

step() { echo; echo "=== $1 ==="; }
# POST json, pretty-print, and return the body for assertions
post() { curl -sf -X POST "$BASE$1" -H 'Content-Type: application/json' -d "$2"; }

step "Step 1: create table '$TABLE'"
post /tables '{
  "name": "'$TABLE'",
  "schema": {"fields": [
    {"name": "id", "type": "int64"},
    {"name": "product", "type": "string"},
    {"name": "category", "type": "string"},
    {"name": "amount", "type": "float64"},
    {"name": "quantity", "type": "int64"},
    {"name": "sale_date", "type": "string"}
  ]}}' | jq .

step "Step 2: insert two batches"
post "/tables/$TABLE/insert" '{
  "txn_id": "demo-batch-1",
  "data": [
    {"id": 1, "product": "Laptop",   "category": "Electronics", "amount": 999.99, "quantity": 2, "sale_date": "2024-01-15"},
    {"id": 2, "product": "Mouse",    "category": "Electronics", "amount": 29.99,  "quantity": 5, "sale_date": "2024-01-15"},
    {"id": 3, "product": "Keyboard", "category": "Electronics", "amount": 79.99,  "quantity": 3, "sale_date": "2024-01-16"},
    {"id": 4, "product": "Monitor",  "category": "Electronics", "amount": 299.99, "quantity": 1, "sale_date": "2024-01-16"},
    {"id": 5, "product": "Chair",    "category": "Furniture",   "amount": 199.99, "quantity": 2, "sale_date": "2024-01-17"}
  ]}' | jq .
B2=$(post "/tables/$TABLE/insert" '{
  "txn_id": "demo-batch-2",
  "data": [
    {"id": 6,  "product": "Desk",       "category": "Furniture",   "amount": 399.99, "quantity": 1, "sale_date": "2024-01-17"},
    {"id": 7,  "product": "Phone",      "category": "Electronics", "amount": 699.99, "quantity": 1, "sale_date": "2024-01-18"},
    {"id": 8,  "product": "Tablet",     "category": "Electronics", "amount": 499.99, "quantity": 2, "sale_date": "2024-01-18"},
    {"id": 9,  "product": "Lamp",       "category": "Furniture",   "amount": 89.99,  "quantity": 3, "sale_date": "2024-01-19"},
    {"id": 10, "product": "Headphones", "category": "Electronics", "amount": 149.99, "quantity": 4, "sale_date": "2024-01-19"}
  ]}')
echo "$B2" | jq .
V2=$(echo "$B2" | jq .new_version)

step "Step 3: queries (scan / filter / aggregate)"
post /query '{"sql": "SELECT * FROM '$TABLE' ORDER BY id"}' | jq '.results | length' | {
  read n; [ "$n" = 10 ] || { echo "ERROR: expected 10 rows, got $n"; exit 1; }
  echo "scan: 10 rows ✓"; }
post /query '{"sql": "SELECT product, amount, quantity FROM '$TABLE' WHERE category = '\''Electronics'\'' ORDER BY id"}' | jq .results
post /query '{"sql": "SELECT category, COUNT(*) AS item_count, ROUND(SUM(amount * quantity), 2) AS total_revenue FROM '$TABLE' GROUP BY category ORDER BY category"}' | jq .results

step "Step 4: table metadata + version history"
curl -sf "$BASE/tables/$TABLE" | jq .
curl -sf "$BASE/tables/$TABLE/versions" | jq .

step "Step 5: time travel"
N1=$(post /query '{"sql": "SELECT COUNT(*) AS n FROM '$TABLE' VERSION AS OF 1"}' | jq '.results[0].n')
[ "$N1" = 5 ] || { echo "ERROR: VERSION AS OF 1 should see 5 rows, got $N1"; exit 1; }
echo "VERSION AS OF 1 sees the 5 batch-1 rows ✓"
curl -sf "$BASE/tables/$TABLE/versions/1/snapshot" | jq '{version, file_count}'

step "Step 6: merge-on-read DELETE"
post /query '{"sql": "DELETE FROM '$TABLE' WHERE category = '\''Furniture'\''"}' | jq .results
N=$(post /query '{"sql": "SELECT COUNT(*) AS n FROM '$TABLE'"}' | jq '.results[0].n')
[ "$N" = 7 ] || { echo "ERROR: expected 7 rows after delete, got $N"; exit 1; }
echo "7 rows remain ✓ (3 Furniture rows masked by deletion vectors)"

step "Step 7: OPTIMIZE compaction"
post /query '{"sql": "OPTIMIZE '$TABLE'"}' | jq .results
curl -sf "$BASE/tables/$TABLE/compaction/metrics" | jq .

step "Step 8: fault tolerance — idempotent commit retry"
# The reference kills the metadata leader mid-commit and retries; in a
# single-process lake the equivalent client contract is txn_id replay:
# a retried commit (same txn_id) must return the ORIGINAL version and
# write nothing new.
RETRY=$(post "/tables/$TABLE/insert" '{
  "txn_id": "demo-batch-2",
  "data": [{"id": 6, "product": "Desk", "category": "Furniture", "amount": 399.99, "quantity": 1, "sale_date": "2024-01-17"}]}')
echo "$RETRY" | jq .
RV=$(echo "$RETRY" | jq .new_version)
[ "$RV" = "$V2" ] || { echo "ERROR: txn replay minted version $RV != $V2"; exit 1; }
N=$(post /query '{"sql": "SELECT COUNT(*) AS n FROM '$TABLE'"}' | jq '.results[0].n')
[ "$N" = 7 ] || { echo "ERROR: txn replay duplicated rows: $N"; exit 1; }
echo "replaying txn 'demo-batch-2' returned version $RV unchanged, no rows duplicated ✓"

step "Step 9: RESTORE to the pre-delete version"
post /query '{"sql": "RESTORE TABLE '$TABLE' TO VERSION AS OF '$V2'"}' | jq .results
N=$(post /query '{"sql": "SELECT COUNT(*) AS n FROM '$TABLE'"}' | jq '.results[0].n')
[ "$N" = 10 ] || { echo "ERROR: expected 10 rows after restore, got $N"; exit 1; }
echo "all 10 rows back ✓"
post /query '{"sql": "DESCRIBE HISTORY '$TABLE'"}' | jq '.results | length' | {
  read n; echo "history: $n versions recorded"; }

step "Step 10: tags and branches (named refs)"
post /query '{"sql": "ALTER TABLE '$TABLE' CREATE TAG audited AS OF VERSION 2"}' | jq .results
post /query '{"sql": "ALTER TABLE '$TABLE' CREATE BRANCH prod AS OF VERSION 2"}' | jq .results
N=$(post /query '{"sql": "SELECT COUNT(*) AS n FROM '$TABLE' VERSION AS OF '\''prod'\''"}' | jq '.results[0].n')
[ "$N" = 10 ] || { echo "ERROR: branch read expected 10 rows, got $N"; exit 1; }
echo "reading through branch 'prod' (v2): $N rows ✓"
post /query '{"sql": "DESCRIBE REFS '$TABLE'"}' | jq .results

step "Step 11: write-audit-publish (staged batch)"
post "/tables/$TABLE/wap/restock-1" '{
  "data": [
    {"id": 11, "product": "Webcam", "category": "Electronics", "amount": 59.99, "quantity": 2, "sale_date": "2024-01-20"},
    {"id": 12, "product": "Stool",  "category": "Furniture",   "amount": 49.99, "quantity": 1, "sale_date": "2024-01-20"}
  ]}' | jq .
AUDIT=$(curl -sf "$BASE/tables/$TABLE/wap/restock-1")
echo "$AUDIT" | jq .
MAIN=$(echo "$AUDIT" | jq .main_rows); OVER=$(echo "$AUDIT" | jq .overlay_rows)
[ "$MAIN" = 10 ] && [ "$OVER" = 12 ] || { echo "ERROR: audit saw main=$MAIN overlay=$OVER"; exit 1; }
echo "staged batch invisible to main (10 rows), audit overlay sees 12 ✓"
post "/tables/$TABLE/wap/restock-1/publish" '{}' | jq .
N=$(post /query '{"sql": "SELECT COUNT(*) AS n FROM '$TABLE'"}' | jq '.results[0].n')
[ "$N" = 12 ] || { echo "ERROR: expected 12 rows after publish, got $N"; exit 1; }
echo "published atomically: 12 rows ✓"

step "Step 12: cross-table atomic transaction"
post /query '{"sql": "CREATE TABLE sales_audit (id int64, note string)"}' | jq .results
post "/txns/q1-close/stage/$TABLE" '{
  "data": [{"id": 13, "product": "Desk", "category": "Furniture", "amount": 199.99, "quantity": 1, "sale_date": "2024-01-21"}]}' | jq .
post "/txns/q1-close/stage/sales_audit" '{
  "data": [{"id": 13, "note": "q1 close batch"}]}' | jq .
STATE=$(curl -sf "$BASE/txns/q1-close" | jq -r .state)
[ "$STATE" = "undecided" ] || { echo "ERROR: expected undecided, got $STATE"; exit 1; }
N=$(post /query '{"sql": "SELECT COUNT(*) AS n FROM '$TABLE'"}' | jq '.results[0].n')
[ "$N" = 12 ] || { echo "ERROR: staged rows leaked before commit (n=$N)"; exit 1; }
echo "both participants staged, nothing visible ✓"
post "/txns/q1-close/commit" '{"tables": ["'$TABLE'", "sales_audit"]}' | jq .
N=$(post /query '{"sql": "SELECT COUNT(*) AS n FROM '$TABLE'"}' | jq '.results[0].n')
M=$(post /query '{"sql": "SELECT COUNT(*) AS n FROM sales_audit"}' | jq '.results[0].n')
[ "$N" = 13 ] && [ "$M" = 1 ] || { echo "ERROR: after commit n=$N m=$M"; exit 1; }
STATE=$(curl -sf "$BASE/txns/q1-close" | jq -r .state)
[ "$STATE" = "done" ] || { echo "ERROR: expected done, got $STATE"; exit 1; }
echo "one decision published both tables atomically ✓"

step "Step 13: fault injection — kill -9 the server, restart, recover"
# The reference's fault-tolerance-demo.sh kills a worker mid-query and
# watches the job complete; the single-process analog kills the SERVER
# with work in flight and shows the durable log carries everything:
# committed data intact, txn-id replay still exactly-once ACROSS process
# death, and the crash-orphaned staging visible and vacuumable.
post "/tables/$TABLE/wap/crash-orphan" '{
  "data": [{"id": 99, "product": "Ghost", "category": "Crash", "amount": 1.0, "quantity": 1, "sale_date": "2024-01-22"}]}' | jq .
# a query in flight when the axe falls (fire-and-forget; its failure IS
# the injected fault)
curl -s -X POST "$BASE/query" -H 'Content-Type: application/json' \
  -d '{"sql": "SELECT COUNT(*) AS n FROM '$TABLE'"}' >/dev/null 2>&1 &
SRV_PID=$(ss -ltnp 2>/dev/null | grep ":$PORT " | grep -oE 'pid=[0-9]+' \
  | head -1 | cut -d= -f2)
[ -n "${SRV_PID:-}" ] || { echo "ERROR: no server pid on port $PORT"; exit 1; }
kill -9 "$SRV_PID"
echo "server pid $SRV_PID killed with SIGKILL (staged batch + in-flight query orphaned)"
wait "$SBT_PID" 2>/dev/null || true

echo "restarting against the same lake dir..."
SPARK_GRAFT_PORT="$PORT" SPARK_GRAFT_LAKE_DIR="$LAKE_DIR" \
  SPARK_GRAFT_CPUS=8 \
  sbt -batch "runMain graft.Serve" >>"$SERVER_LOG" 2>&1 &
SBT_PID=$!
for i in $(seq 1 60); do
  if curl -sf "$BASE/health" >/dev/null 2>&1; then break; fi
  if ! kill -0 "$SBT_PID" 2>/dev/null; then
    echo "ERROR: restarted server died; tail of $SERVER_LOG:"
    tail -20 "$SERVER_LOG"; exit 1
  fi
  sleep 3
  [ "$i" = 60 ] && { echo "ERROR: server not ready after 180s"; exit 1; }
done
# committed data survived the kill bit-for-bit
N=$(post /query '{"sql": "SELECT COUNT(*) AS n FROM '$TABLE'"}' | jq '.results[0].n')
M=$(post /query '{"sql": "SELECT COUNT(*) AS n FROM sales_audit"}' | jq '.results[0].n')
[ "$N" = 13 ] && [ "$M" = 1 ] || { echo "ERROR: after crash n=$N m=$M"; exit 1; }
echo "committed data intact after SIGKILL: $N + $M rows ✓"
# txn-id retry is exactly-once ACROSS process death (txn map replays
# from the durable log, not memory)
RETRY=$(post "/tables/$TABLE/insert" '{
  "txn_id": "demo-batch-2",
  "data": [{"id": 6, "product": "Desk", "category": "Furniture", "amount": 399.99, "quantity": 1, "sale_date": "2024-01-17"}]}')
RV=$(echo "$RETRY" | jq .new_version)
[ "$RV" = "$V2" ] || { echo "ERROR: post-crash replay minted $RV != $V2"; exit 1; }
echo "txn 'demo-batch-2' replay after restart: version $RV unchanged ✓"
# the decided-txn sweep finds nothing pending (q1-close already done)
post /txns/recover '{}' | jq .
# the crash-orphaned staged batch is still visible — and vacuumable
ORPHANS=$(curl -sf "$BASE/tables/$TABLE/wap" | jq '.staged | length')
[ "$ORPHANS" = 1 ] || { echo "ERROR: expected 1 orphaned staging, got $ORPHANS"; exit 1; }
curl -sf -X DELETE "$BASE/tables/$TABLE/wap/crash-orphan" | jq .
ORPHANS=$(curl -sf "$BASE/tables/$TABLE/wap" | jq '.staged | length')
[ "$ORPHANS" = 0 ] || { echo "ERROR: orphan survived vacuum: $ORPHANS"; exit 1; }
N=$(post /query '{"sql": "SELECT COUNT(*) AS n FROM '$TABLE'"}' | jq '.results[0].n')
[ "$N" = 13 ] || { echo "ERROR: vacuum touched committed rows (n=$N)"; exit 1; }
echo "orphaned staging vacuumed; main line untouched ✓"

step "Step 14: governance chain — SET MASK -> masked read -> lineage"
# install a mask: analysts see only the product's initial + ****
post /query '{"sql": "ALTER TABLE '$TABLE' SET MASK product AS (concat(substring(product, 1, 1), '\''****'\'')) EXEMPT (admin)"}' | jq .
MROW=$(curl -sf "$BASE/tables/$TABLE/masked?role=analyst" | jq -r '.results[0].product')
case "$MROW" in
  ?\*\*\*\*) echo "analyst sees masked product '$MROW' ✓" ;;
  *) echo "ERROR: mask not applied (got '$MROW')"; exit 1 ;;
esac
AROW=$(curl -sf "$BASE/tables/$TABLE/masked?role=admin" | jq -r '.results[0].product')
case "$AROW" in
  ?\*\*\*\*) echo "ERROR: admin got masked value '$AROW'"; exit 1 ;;
  *) echo "admin (exempt) reads raw product '$AROW' ✓" ;;
esac
# the audit question: what RAW columns influence the analyst's view?
# the masked product column must trace back to the raw product source
LIN=$(post /lineage '{"table": "'$TABLE'", "role": "analyst"}')
HITS=$(echo "$LIN" | jq '[.lineage[] | select(.out_col == "product" and .src_col == "product" and .src_table == "'$TABLE'")] | length')
[ "$HITS" = 1 ] || { echo "ERROR: masked product lineage lost its raw source:"; echo "$LIN" | jq .; exit 1; }
echo "lineage over the masked read: product <- $TABLE.product (raw) ✓"
# row-level security: analysts additionally see only Electronics rows;
# the governed read composes filter (raw membership) + mask (appearance)
post /query '{"sql": "ALTER TABLE '$TABLE' SET ROW FILTER (category = '\''Electronics'\'') EXEMPT (admin)"}' | jq -c .
GN=$(curl -sf "$BASE/tables/$TABLE/masked?role=analyst" | jq '.results | length')
AN=$(curl -sf "$BASE/tables/$TABLE/masked?role=admin" | jq '.results | length')
RF=$(curl -sf "$BASE/tables/$TABLE/masked?role=analyst" | jq -r '.row_filter')
[ "$GN" -lt "$AN" ] || { echo "ERROR: row filter did not narrow analyst rows ($GN vs $AN)"; exit 1; }
[ "$RF" = "category = 'Electronics'" ] || { echo "ERROR: row_filter field '$RF'"; exit 1; }
echo "row filter: analyst sees $GN of $AN rows (masked), admin exempt ✓"
post /query '{"sql": "ALTER TABLE '$TABLE' DROP ROW FILTER"}' | jq -c .
post /query '{"sql": "ALTER TABLE '$TABLE' DROP MASK product"}' | jq -c .

step "Step 15: logical views + SQL transaction blocks"
# a persisted view; the cached SELECT over it must recompute after a
# commitless CREATE OR REPLACE (the result-cache fingerprint folds the
# view-catalog version — same staleness class as branch moves)
post /query '{"sql": "CREATE VIEW pricey AS SELECT product, amount FROM '$TABLE' WHERE amount > 500"}' | jq -c .
VN1=$(post /query '{"sql": "SELECT count(*) AS n FROM pricey"}' | jq '.results[0].n')
post /query '{"sql": "CREATE OR REPLACE VIEW pricey AS SELECT product, amount FROM '$TABLE' WHERE amount > 100"}' | jq -c .
VN2=$(post /query '{"sql": "SELECT count(*) AS n FROM pricey"}' | jq '.results[0].n')
[ "$VN2" -gt "$VN1" ] || { echo "ERROR: replaced view served stale rows ($VN1 -> $VN2)"; exit 1; }
echo "view replace widened pricey: $VN1 -> $VN2 rows, cache invalidated ✓"
post /query '{"sql": "DESCRIBE VIEWS"}' | jq -c .results
# BEGIN/COMMIT: a per-category summary and its source snapshot count
# land in TWO tables atomically through the 2PC; the replayed block is
# a no-op returning the recorded versions
post /query '{"sql": "CREATE TABLE sales_summary (category string, n int64)"}' | jq -c .results
post /query '{"sql": "CREATE TABLE sales_total (n int64)"}' | jq -c .results
TXSQL='BEGIN TRANSACTION '\''demo-tx'\''; INSERT INTO sales_summary SELECT category, count(*) AS n FROM '$TABLE' GROUP BY category; INSERT INTO sales_total SELECT count(*) AS n FROM '$TABLE'; COMMIT'
TX1=$(post /query "{\"sql\": \"$TXSQL\"}" | jq -r '.results[0].tables')
[ "$TX1" = "sales_summary@1,sales_total@1" ] || { echo "ERROR: txn published $TX1"; exit 1; }
TX2=$(post /query "{\"sql\": \"$TXSQL\"}" | jq -r '.results[0].tables')
[ "$TX2" = "$TX1" ] || { echo "ERROR: replayed txn re-published ($TX2)"; exit 1; }
TOT=$(post /query '{"sql": "SELECT n FROM sales_total"}' | jq '.results[0].n')
SUM=$(post /query '{"sql": "SELECT sum(n) AS s FROM sales_summary"}' | jq '.results[0].s')
[ "$TOT" = "$SUM" ] || { echo "ERROR: cross-table snapshot torn ($TOT vs $SUM)"; exit 1; }
echo "2PC block committed atomically ($TX1), replay no-op, summary($SUM)=total($TOT) ✓"
post /query '{"sql": "DROP VIEW pricey"}' | jq -c .

step "Step 16: txn body-hash guard + governance-log retention"
# the committed 'demo-tx' id reused with a DIFFERENT statement body must
# refuse loudly — a silent no-op would report success while never
# executing the new statements
BADTX='BEGIN TRANSACTION '\''demo-tx'\''; INSERT INTO sales_total SELECT count(*) + 1 AS n FROM '$TABLE'; COMMIT'
CODE=$(curl -s -o "$LAKE_DIR/badtx.txt" -w '%{http_code}' -X POST "$BASE/query" \
  -H 'Content-Type: application/json' -d "{\"sql\": \"$BADTX\"}")
[ "$CODE" -ge 400 ] || { echo "ERROR: reused txn id with different body accepted (HTTP $CODE)"; exit 1; }
grep -qi "DIFFERENT statement body" "$LAKE_DIR/badtx.txt" || { echo "ERROR: wrong refusal:"; cat "$LAKE_DIR/badtx.txt"; exit 1; }
echo "reused txn id with a different body refused (HTTP $CODE) ✓"
# governance mini-logs append one full-catalog entry per mutation;
# VACUUM POLICIES sweeps history while the governing policy stays.
# RETAIN 1 refuses through SQL (a lone survivor races concurrent
# cross-process policy readers) — the sweep keeps at least 2
post /query '{"sql": "ALTER TABLE '$TABLE' SET MASK product AS (concat(substring(product, 1, 1), '\''****'\''))"}' >/dev/null
post /query '{"sql": "ALTER TABLE '$TABLE' SET MASK product AS (concat(substring(product, 1, 2), '\''***'\'')) EXEMPT (admin)"}' >/dev/null
RCODE=$(curl -s -o "$LAKE_DIR/badretain.txt" -w '%{http_code}' -X POST "$BASE/query" \
  -H 'Content-Type: application/json' -d '{"sql": "VACUUM POLICIES ON '$TABLE' RETAIN 1 VERSIONS"}')
[ "$RCODE" -ge 400 ] || { echo "ERROR: RETAIN 1 accepted (HTTP $RCODE)"; exit 1; }
grep -qi "at least 2" "$LAKE_DIR/badretain.txt" || { echo "ERROR: wrong refusal:"; cat "$LAKE_DIR/badretain.txt"; exit 1; }
echo "RETAIN 1 refused (HTTP $RCODE) — governance vacuums keep >= 2 ✓"
VP=$(post /query '{"sql": "VACUUM POLICIES ON '$TABLE' RETAIN 2 VERSIONS"}')
MD=$(echo "$VP" | jq '.results[0].masks_deleted')
[ "$MD" -ge 1 ] || { echo "ERROR: VACUUM POLICIES deleted nothing:"; echo "$VP" | jq .; exit 1; }
MROW2=$(curl -sf "$BASE/tables/$TABLE/masked?role=analyst" | jq -r '.results[0].product')
case "$MROW2" in
  ??\*\*\*) echo "post-vacuum governing mask intact ('$MROW2'), $MD history entries swept ✓" ;;
  *) echo "ERROR: vacuum changed the governing mask (got '$MROW2')"; exit 1 ;;
esac
post /query '{"sql": "ALTER TABLE '$TABLE' DROP MASK product"}' >/dev/null
VV=$(post /query '{"sql": "VACUUM VIEW CATALOG RETAIN 2 VERSIONS"}')
VD=$(echo "$VV" | jq '.results[0].deleted')
[ "$VD" -ge 1 ] || { echo "ERROR: VACUUM VIEW CATALOG deleted nothing:"; echo "$VV" | jq .; exit 1; }
echo "view-catalog history swept ($VD entries), catalog version pinned ✓"

echo
echo "=== demo completed successfully ==="
echo "metrics: curl $BASE/metrics | grep lakehouse_"

"""Shared DuckDB spill-directory hygiene for check.py / ln_guard.py.

One implementation (r12, extracted from the two verbatim copies that had
already started to need divergent fixes): pin the DuckDB temp directory to
the caller's GRAFT_SPILL_DIR when set, else a per-PID dir under repo/.tmp
cleaned at exit, and hard-cap it so a mis-scaled oracle dies loudly instead
of filling the disk (round-8 postmortem: an uncapped in-memory DuckDB left
~80 GB of duckdb_temp_storage-*.tmp and zeroed the round's artifacts).

Orphan sweep safety (r12): a swept dir's owner is identified by PID *and
process start time* (field 22 of /proc/<pid>/stat, written to a `.owner`
marker at dir creation). A recycled PID therefore cannot keep a dead run's
spill alive, and a just-started run that reuses a swept PID is never
deleted mid-listdir (its marker matches its live /proc entry). Dirs from
older revisions without a marker fall back to an age gate: only removed
when untouched for > 6 hours.

Signal note: the SIGTERM/SIGINT handlers call sys.exit so atexit cleanup
runs, but Python only delivers signals between bytecodes — a long NATIVE
duckdb execute defers them until the query returns. Callers that must
enforce a deadline therefore pair timeout(1) with -k/SIGKILL escalation
(check_batch.sh does); the handler here covers the common case of a signal
landing between queries.
"""
import atexit
import os
import re
import shutil
import signal
import sys

# dirs without an owner marker (pre-r12 layout) are swept only when older
ORPHAN_MAX_AGE_SEC = 6 * 3600


def _proc_start_time(pid: str) -> str | None:
    """Kernel start time (clock ticks since boot) of a live PID, None if
    gone. Field 22 of /proc/<pid>/stat, counted after the parenthesised
    comm field (comm may contain spaces)."""
    try:
        with open(f"/proc/{pid}/stat", "rb") as f:
            stat = f.read().decode("ascii", "replace")
        return stat[stat.rindex(")") + 2:].split()[19]  # field 22 = idx 19 after comm
    except (OSError, ValueError, IndexError):
        return None


def _sweep_orphans(tmp_root: str) -> None:
    if not os.path.isdir("/proc"):
        # no procfs (non-Linux): liveness is unknowable — never sweep,
        # or a concurrent live run's spill could be deleted mid-oracle
        return
    for d in os.listdir(tmp_root):
        m = re.fullmatch(r"duckdb_spill\.(\d+)", d)
        if not m or m.group(1) == str(os.getpid()):
            continue
        path = os.path.join(tmp_root, d)
        marker = os.path.join(path, ".owner")
        live = _proc_start_time(m.group(1))
        try:
            with open(marker) as f:
                owner_start = f.read().strip()
            # owner dead, or PID recycled by a different process
            if live is None or live != owner_start:
                shutil.rmtree(path, True)
        except OSError:
            # no marker (old layout): age-gate so a just-created dir in the
            # listdir window is never raced; a dead run's dir still goes
            try:
                age_ok = os.path.getmtime(path) < __import__("time").time() - ORPHAN_MAX_AGE_SEC
            except OSError:
                age_ok = False
            if live is None and age_ok:
                shutil.rmtree(path, True)


def setup_spill(con) -> str:
    """Point `con`'s temp_directory at a capped spill dir and return it."""
    spill = os.environ.get("GRAFT_SPILL_DIR")
    if not spill:
        tmp_root = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "..", ".tmp")
        if os.path.isdir(tmp_root):
            _sweep_orphans(tmp_root)
        spill = os.path.join(tmp_root, f"duckdb_spill.{os.getpid()}")
        os.makedirs(spill, exist_ok=True)
        with open(os.path.join(spill, ".owner"), "w") as f:
            f.write(_proc_start_time(str(os.getpid())) or "?")
        atexit.register(shutil.rmtree, spill, True)
        # SIGTERM/SIGINT -> clean exit so atexit runs (timeout(1) sends
        # TERM); only effective between native duckdb calls — see module doc
        for sig in (signal.SIGTERM, signal.SIGINT):
            signal.signal(sig, lambda s, f: sys.exit(128 + s))
    os.makedirs(spill, exist_ok=True)
    con.execute(f"SET temp_directory='{spill}'")
    # default 20GB; GRAFT_SPILL_CAP overrides for known-heavy replays
    # (r13: q_graph_bfs_full's unrolled-round oracle on x63 organic data
    # needed ~50GB — re-run with GRAFT_SPILL_CAP=50GB on a drive that has it)
    cap = os.environ.get("GRAFT_SPILL_CAP", "20GB")
    con.execute(f"SET max_temp_directory_size='{cap}'")
    return spill

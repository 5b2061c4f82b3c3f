"""Incremental (streaming) sessionize over an append-only event log.

``sessionize_append`` consumes one new CHUNK of events at a time and
maintains durable state under ``state_dir`` so each run does work
proportional to the chunk, never to history:

* ``closed/part=<run>/`` — sessions that can no longer grow, appended
  per run through the checkpoint manifest (atomic tmp→rename +
  lineage line; a re-run of the same ``run_id`` is a no-op),
* ``tails-<run>/`` + ``_TAILS.json`` pointer — ONE row per active user:
  the still-open last session (the only state a future chunk can
  touch). The pointer file is replaced atomically, so a crash between
  writes leaves the previous state consistent.

Per chunk: sessionize the chunk alone (the distributed scan plan), then
stitch its per-user FIRST session onto the saved open tail with one
per-user aggregate + one hash join — O(users-in-chunk) rows, no
per-event rework. The append-log contract (events of a user arrive in
non-decreasing time across chunks) is asserted per user when
``strict=True``; violating it would require re-sessionizing history,
which is exactly what this operator exists to avoid.

Parity contract (tested): folding chunks through ``sessionize_append``
yields byte-identical sessions to ``sessionize`` over the concatenated
log.
"""

from __future__ import annotations

import json
import os
import uuid
from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from .checkpoint import completed_partitions, write_partition

_TAILS_PTR = "_TAILS.json"
_SESSION_COLS = ["user_id", "session_id", "n_events", "start_us", "end_us"]


def _tails_pointer(state_dir: str) -> Optional[str]:
    path = os.path.join(state_dir, _TAILS_PTR)
    if not os.path.exists(path):
        return None
    with open(path, encoding="utf-8") as f:
        rel = json.load(f)["path"]
    return os.path.join(state_dir, rel)


def _write_tails(state_dir: str, ds: rd.Dataset, run_id: str) -> None:
    rel = f"tails-{run_id}-{uuid.uuid4().hex[:6]}"
    final = os.path.join(state_dir, rel)
    tmp = final + ".tmp"
    ds.write_parquet(tmp)
    os.replace(tmp, final)
    ptr_tmp = os.path.join(state_dir, f".{_TAILS_PTR}.{uuid.uuid4().hex[:6]}")
    with open(ptr_tmp, "w", encoding="utf-8") as f:
        json.dump({"path": rel, "run": run_id}, f)
    os.replace(ptr_tmp, os.path.join(state_dir, _TAILS_PTR))


def _read_tails(state_dir: str) -> Optional[rd.Dataset]:
    path = _tails_pointer(state_dir)
    if path is None:
        return None
    return rd.read_parquet(path)


def sessionize_state_read(state_dir: str) -> rd.Dataset:
    """Current complete sessions view: closed partitions ∪ open tails."""
    closed_dir = os.path.join(state_dir, "closed")
    parts = [
        os.path.join(closed_dir, f"part={p}")
        for p in completed_partitions(closed_dir)
    ]
    files = [
        os.path.join(p, n)
        for p in parts
        if os.path.isdir(p)
        for n in sorted(os.listdir(p))
        if n.endswith(".parquet")
    ]  # a LIST of paths must be files on this Ray version, not dirs
    pieces = []
    if files:
        pieces.append(
            rd.read_parquet(files, columns=_SESSION_COLS).select_columns(
                _SESSION_COLS
            )
        )
    tails = _read_tails(state_dir)
    if tails is not None:
        pieces.append(tails.select_columns(_SESSION_COLS))
    if not pieces:
        return rd.from_arrow(
            pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "session_id": pa.array([], pa.int64()),
                    "n_events": pa.array([], pa.int64()),
                    "start_us": pa.array([], pa.int64()),
                    "end_us": pa.array([], pa.int64()),
                }
            )
        )
    out = pieces[0]
    for p in pieces[1:]:
        out = out.union(p)
    return out


def sessionize_append(
    new_events: rd.Dataset,
    state_dir: str,
    gap_seconds: float = 1800.0,
    user_col: str = "user_id",
    ts_col: str = "ts",
    *,
    run_id: Optional[str] = None,
    strict: bool = True,
    num_partitions: Optional[int] = None,
    plan: str = "auto",
    broadcast_cap: int = 2_000_000,
) -> rd.Dataset:
    """Fold one appended event chunk into the session state; return the
    updated complete sessions view (closed ∪ open tails).

    ``run_id`` names the chunk for idempotent resume: a run whose id is
    already recorded returns the current view without reprocessing.

    ``plan="broadcast"`` (default under ``auto`` while active-user tails
    AND chunk sessions both fit ``broadcast_cap``) removes all three
    per-fold hash joins: the per-user stitch runs as driver numpy over
    the two vocab-sized tables and the session renumber is one broadcast
    searchsorted map over the chunk — the join fixed costs (aggregator
    pool spin-up ×3) dominate a fold at small state. ``plan="shuffle"``
    keeps the join realization for beyond-memory user populations;
    parity-tested.
    """
    from ..streams import sessionize
    from ..util import JOIN_AGG_ARGS, join_partitions

    # each join partition pins an aggregator actor — size to the cluster
    # (and use fractional CPUs) or a 4-CPU session starves (util.py:21)
    npart = num_partitions or join_partitions()

    os.makedirs(state_dir, exist_ok=True)
    runs_path = os.path.join(state_dir, "_RUNS.jsonl")
    run_id = run_id if run_id is not None else str(len(_runs(runs_path)))
    if run_id in _runs(runs_path):
        return sessionize_state_read(state_dir)

    gap_us = int(gap_seconds * 1_000_000)
    new_sess = sessionize(
        new_events, gap_seconds, user_col=user_col, ts_col=ts_col
    ).materialize()
    if new_sess.count() == 0:
        _record_run(runs_path, run_id)
        return sessionize_state_read(state_dir)

    tails = _read_tails(state_dir)
    tails_count = tails.count() if tails is not None else 0
    have_tails = tails_count > 0
    if plan not in ("auto", "broadcast", "shuffle"):
        raise ValueError(f"unknown plan: {plan!r}")
    if plan == "auto":
        plan = (
            "broadcast"
            if tails_count <= broadcast_cap
            and new_sess.count() <= broadcast_cap
            else "shuffle"
        )
    if plan == "broadcast":
        closed_b, tails_b = _fold_broadcast(
            new_sess, tails if have_tails else None, gap_us, strict
        )
        return _commit_fold(state_dir, runs_path, run_id, closed_b, tails_b)

    # per-user chunk summary: session count + the first session's start
    # (sessions are time-ordered per user, so Min(start_us) IS session 1's)
    from ray.data.aggregate import Max, Min

    per_user = new_sess.groupby("user_id").aggregate(
        Max("session_id", alias_name="max_sid"),
        Min("start_us", alias_name="first_start"),
    )

    if have_tails:
        t = tails.map_batches(
            lambda b: pa.table(
                {
                    "user_id": b["user_id"],
                    "t_sid": b["session_id"],
                    "t_n": b["n_events"],
                    "t_start": b["start_us"],
                    "t_end": b["end_us"],
                }
            ),
            batch_format="pyarrow",
        )
        per_user = per_user.join(
            t,
            "left_outer",
            npart,
            on=("user_id",),
            aggregator_ray_remote_args=JOIN_AGG_ARGS,
        )

        def stitch(batch: pa.Table) -> pa.Table:
            # Nullable int64 out of the left-outer join must NOT round-trip
            # through float64 (to_numpy of a null-bearing int column emits
            # NaN-float — exact only below 2^53, ADVICE r4): fill_null to
            # the sentinel IN ARROW so every array stays int64 end-to-end.
            pc_ = pa.compute
            MIN64 = np.iinfo(np.int64).min
            has_tail = ~pc_.is_null(batch["t_end"]).to_numpy(zero_copy_only=False)

            def i64(col, sentinel):
                return pc_.fill_null(
                    pc_.cast(batch[col], pa.int64()), pa.scalar(sentinel, pa.int64())
                ).to_numpy(zero_copy_only=False)

            t_end_i = i64("t_end", MIN64)
            first = batch["first_start"].to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            if strict and has_tail.any():
                bad = has_tail & (first < t_end_i)
                if bad.any():
                    u = batch["user_id"].to_numpy(zero_copy_only=False)[bad][:5]
                    raise ValueError(
                        "sessionize_append: out-of-order append for users "
                        f"{u.tolist()} — chunk events predate the saved tail; "
                        "the append-log contract requires per-user "
                        "non-decreasing time across chunks"
                    )
            t_sid = i64("t_sid", 0)
            merge = has_tail & (first - t_end_i <= gap_us)
            offset = t_sid - merge.astype(np.int64)
            t_n = i64("t_n", 0)
            t_start = i64("t_start", 0)
            return pa.table(
                {
                    "user_id": batch["user_id"],
                    "max_sid": batch["max_sid"],
                    "offset": pa.array(offset, pa.int64()),
                    "merge": pa.array(merge),
                    "m_start": pa.array(t_start, pa.int64()),
                    "m_n": pa.array(np.where(merge, t_n, 0), pa.int64()),
                    # a tail that does NOT merge is closed by this chunk —
                    # carry its fields so it lands in the closed partition
                    # instead of silently vanishing from state
                    "tail_closed": pa.array(has_tail & ~merge),
                    "t_sid": pa.array(t_sid, pa.int64()),
                    "t_n": pa.array(t_n, pa.int64()),
                    "t_start": pa.array(t_start, pa.int64()),
                    "t_end": pa.array(t_end_i, pa.int64()),
                }
            )

        per_user = per_user.map_batches(stitch, batch_format="pyarrow")
    else:

        def no_tail(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            return pa.table(
                {
                    "user_id": batch["user_id"],
                    "max_sid": batch["max_sid"],
                    "offset": pa.array(np.zeros(n, np.int64), pa.int64()),
                    "merge": pa.array(np.zeros(n, bool)),
                    "m_start": pa.array(np.zeros(n, np.int64), pa.int64()),
                    "m_n": pa.array(np.zeros(n, np.int64), pa.int64()),
                }
            )

        per_user = per_user.map_batches(no_tail, batch_format="pyarrow")

    per_user = per_user.materialize()
    adj = new_sess.join(
        per_user,
        "inner",
        npart,
        on=("user_id",),
        aggregator_ray_remote_args=JOIN_AGG_ARGS,
    )

    def finalize(batch: pa.Table) -> pa.Table:
        sid = batch["session_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        offset = batch["offset"].to_numpy(zero_copy_only=False).astype(np.int64)
        merge = batch["merge"].to_numpy(zero_copy_only=False).astype(bool)
        is_first = sid == 1
        start = batch["start_us"].to_numpy(zero_copy_only=False).astype(np.int64)
        n_ev = batch["n_events"].to_numpy(zero_copy_only=False).astype(np.int64)
        m_start = batch["m_start"].to_numpy(zero_copy_only=False).astype(np.int64)
        m_n = batch["m_n"].to_numpy(zero_copy_only=False).astype(np.int64)
        merged_first = merge & is_first
        return pa.table(
            {
                "user_id": batch["user_id"],
                "session_id": pa.array(sid + offset, pa.int64()),
                "n_events": pa.array(
                    n_ev + np.where(merged_first, m_n, 0), pa.int64()
                ),
                "start_us": pa.array(
                    np.where(merged_first, m_start, start), pa.int64()
                ),
                "end_us": batch["end_us"],
                "_is_tail": pa.array(
                    sid
                    == batch["max_sid"].to_numpy(zero_copy_only=False).astype(
                        np.int64
                    )
                ),
            }
        )

    adj = adj.map_batches(finalize, batch_format="pyarrow").materialize()

    def _split(flag: bool):
        def f(batch: pa.Table) -> pa.Table:
            mask = pc.equal(batch["_is_tail"], flag)
            return batch.filter(mask).select(_SESSION_COLS)

        return f

    closed = adj.map_batches(_split(False), batch_format="pyarrow")
    new_tails = adj.map_batches(_split(True), batch_format="pyarrow")

    if have_tails:

        def closed_tails(batch: pa.Table) -> pa.Table:
            m = batch["tail_closed"].to_numpy(zero_copy_only=False).astype(bool)
            sel = batch.filter(pa.array(m))
            return pa.table(
                {
                    "user_id": sel["user_id"],
                    "session_id": sel["t_sid"],
                    "n_events": sel["t_n"],
                    "start_us": sel["t_start"],
                    "end_us": sel["t_end"],
                }
            )

        closed = closed.union(
            per_user.map_batches(closed_tails, batch_format="pyarrow")
        )

    # tails of users untouched by this chunk stay open
    if have_tails:
        seen = per_user.select_columns(["user_id"])
        untouched = tails.select_columns(_SESSION_COLS).join(
            seen,
            "left_anti",
            npart,
            on=("user_id",),
            aggregator_ray_remote_args=JOIN_AGG_ARGS,
        )
        # left_anti with an empty probe side is safe (seen is non-empty here:
        # new_sess has rows ⇒ per_user has rows)
        new_tails = new_tails.union(untouched)

    return _commit_fold(state_dir, runs_path, run_id, closed, new_tails)


def _commit_fold(
    state_dir: str, runs_path: str, run_id: str, closed: rd.Dataset, new_tails: rd.Dataset
) -> rd.Dataset:
    closed = closed.materialize()
    if closed.count() > 0:
        # write_parquet of an EMPTY dataset creates no files/dir, which
        # would break the tmp→rename protocol — skip; the run record
        # alone is the lineage for an all-tails chunk
        write_partition(closed, os.path.join(state_dir, "closed"), run_id)
    _write_tails(state_dir, new_tails.materialize(), run_id)
    _record_run(runs_path, run_id)
    return sessionize_state_read(state_dir)


def _fold_broadcast(
    new_sess: rd.Dataset,
    tails: "Optional[rd.Dataset]",
    gap_us: int,
    strict: bool,
) -> "tuple[rd.Dataset, rd.Dataset]":
    """Join-free fold body: both vocab-sized tables (active-user tails,
    per-user chunk summary) live as driver/broadcast numpy — the stitch
    is pure numpy and the chunk renumber is one searchsorted map over
    ``new_sess``. Bounded by ``broadcast_cap`` (checked by the caller)."""
    import ray

    from ray.data.aggregate import Max, Min

    from ..util import cached_get

    per_user = new_sess.groupby("user_id").aggregate(
        Max("session_id", alias_name="max_sid"),
        Min("start_us", alias_name="first_start"),
    )
    us, ms, fs = [], [], []
    for b in per_user.iter_batches(batch_size=1 << 20, batch_format="pyarrow"):
        us.append(b["user_id"].to_numpy(zero_copy_only=False))
        ms.append(b["max_sid"].to_numpy(zero_copy_only=False))
        fs.append(b["first_start"].to_numpy(zero_copy_only=False))
    u = np.concatenate(us)
    order = np.argsort(u, kind="stable")
    u = u[order].astype(np.int64)
    max_sid = np.concatenate(ms)[order].astype(np.int64)
    first = np.concatenate(fs)[order].astype(np.int64)
    nu = len(u)

    if tails is not None:
        tu_l, ts_l, tn_l, tst_l, te_l = [], [], [], [], []
        for b in tails.iter_batches(batch_size=1 << 20, batch_format="pyarrow"):
            tu_l.append(b["user_id"].to_numpy(zero_copy_only=False))
            ts_l.append(b["session_id"].to_numpy(zero_copy_only=False))
            tn_l.append(b["n_events"].to_numpy(zero_copy_only=False))
            tst_l.append(b["start_us"].to_numpy(zero_copy_only=False))
            te_l.append(b["end_us"].to_numpy(zero_copy_only=False))
        tu = np.concatenate(tu_l)
        torder = np.argsort(tu, kind="stable")
        tu = tu[torder].astype(np.int64)
        t_sid = np.concatenate(ts_l)[torder].astype(np.int64)
        t_n = np.concatenate(tn_l)[torder].astype(np.int64)
        t_start = np.concatenate(tst_l)[torder].astype(np.int64)
        t_end = np.concatenate(te_l)[torder].astype(np.int64)
        ix = np.searchsorted(tu, u)
        ix_c = np.minimum(ix, max(len(tu) - 1, 0))
        has_tail = (tu[ix_c] == u) if len(tu) else np.zeros(nu, bool)
        if strict and has_tail.any():
            bad = has_tail & (
                first < np.where(has_tail, t_end[ix_c], np.iinfo(np.int64).min)
            )
            if bad.any():
                raise ValueError(
                    "sessionize_append: out-of-order append for users "
                    f"{u[bad][:5].tolist()} — chunk events predate the saved "
                    "tail; the append-log contract requires per-user "
                    "non-decreasing time across chunks"
                )
        tsid_u = np.where(has_tail, t_sid[ix_c], 0)
        tend_u = np.where(has_tail, t_end[ix_c], np.iinfo(np.int64).min)
        merge = has_tail & (first - tend_u <= gap_us)
        offset = tsid_u - merge.astype(np.int64)
        m_start = np.where(merge, t_start[ix_c], 0)
        m_n = np.where(merge, t_n[ix_c], 0)
        # tails CLOSED by this chunk (present, not merged)
        tc = has_tail & ~merge
        closed_tails_tbl = pa.table(
            {
                "user_id": pa.array(u[tc], pa.int64()),
                "session_id": pa.array(tsid_u[tc], pa.int64()),
                "n_events": pa.array(t_n[ix_c][tc], pa.int64()),
                "start_us": pa.array(t_start[ix_c][tc], pa.int64()),
                "end_us": pa.array(t_end[ix_c][tc], pa.int64()),
            }
        )
        # tails of users NOT in this chunk stay open
        jx = np.searchsorted(u, tu)
        jx_c = np.minimum(jx, max(nu - 1, 0))
        touched = (u[jx_c] == tu) if nu else np.zeros(len(tu), bool)
        keep = ~touched
        untouched_tbl = pa.table(
            {
                "user_id": pa.array(tu[keep], pa.int64()),
                "session_id": pa.array(t_sid[keep], pa.int64()),
                "n_events": pa.array(t_n[keep], pa.int64()),
                "start_us": pa.array(t_start[keep], pa.int64()),
                "end_us": pa.array(t_end[keep], pa.int64()),
            }
        )
    else:
        merge = np.zeros(nu, bool)
        offset = np.zeros(nu, np.int64)
        m_start = np.zeros(nu, np.int64)
        m_n = np.zeros(nu, np.int64)
        closed_tails_tbl = untouched_tbl = None

    lut_ref = ray.put((u, offset, merge, m_start, m_n, max_sid))

    def finalize(batch: pa.Table) -> pa.Table:
        uu, off_a, mg_a, mst_a, mn_a, msid_a = cached_get(lut_ref)
        uid = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ix = np.searchsorted(uu, uid)  # every chunk user IS in the LUT
        sid = batch["session_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        start = batch["start_us"].to_numpy(zero_copy_only=False).astype(np.int64)
        n_ev = batch["n_events"].to_numpy(zero_copy_only=False).astype(np.int64)
        merged_first = mg_a[ix] & (sid == 1)
        return pa.table(
            {
                "user_id": batch["user_id"],
                "session_id": pa.array(sid + off_a[ix], pa.int64()),
                "n_events": pa.array(
                    n_ev + np.where(merged_first, mn_a[ix], 0), pa.int64()
                ),
                "start_us": pa.array(
                    np.where(merged_first, mst_a[ix], start), pa.int64()
                ),
                "end_us": batch["end_us"],
                "_is_tail": pa.array(sid == msid_a[ix]),
            }
        )

    adj = new_sess.map_batches(finalize, batch_format="pyarrow").materialize()

    def _split(flag: bool):
        def f(batch: pa.Table) -> pa.Table:
            mask = pc.equal(batch["_is_tail"], flag)
            return batch.filter(mask).select(_SESSION_COLS)

        return f

    closed = adj.map_batches(_split(False), batch_format="pyarrow")
    new_tails = adj.map_batches(_split(True), batch_format="pyarrow")
    if closed_tails_tbl is not None and closed_tails_tbl.num_rows:
        closed = closed.union(rd.from_arrow(closed_tails_tbl))
    if untouched_tbl is not None and untouched_tbl.num_rows:
        new_tails = new_tails.union(rd.from_arrow(untouched_tbl))
    return closed, new_tails


def _runs(runs_path: str) -> set:
    if not os.path.exists(runs_path):
        return set()
    with open(runs_path, encoding="utf-8") as f:
        return {json.loads(line)["run"] for line in f if line.strip()}


def _record_run(runs_path: str, run_id: str) -> None:
    with open(runs_path, "a", encoding="utf-8") as f:
        f.write(json.dumps({"run": run_id}) + "\n")


# ---------------------------------------------------------------------------
# Streaming top-k: incremental Misra-Gries heavy-hitters state
# (round-5, VERDICT r4 #7 — the mergeable heavy_hitters partials wired
# into the same durable append-state machinery as sessionize_append)
# ---------------------------------------------------------------------------

_HH_PTR = "_HH.json"


def _hh_pointer(state_dir: str) -> Optional[dict]:
    path = os.path.join(state_dir, _HH_PTR)
    if not os.path.exists(path):
        return None
    with open(path, encoding="utf-8") as f:
        return json.load(f)


def heavy_hitters_append(
    chunk: rd.Dataset,
    state_dir: str,
    col: str,
    *,
    capacity: int = 4096,
    run_id: Optional[str] = None,
) -> "tuple[pa.Table, int]":
    """Fold one appended chunk into a durable Misra-Gries summary and
    return the updated full summary (Arrow table (col, lb) sorted by lb
    desc / value asc, plus the cumulative err).

    Per fold: ONE distributed streaming pass over the chunk
    (``mg_sketch_dataset`` — O(capacity) counters per batch), then an
    O(capacity) driver ``mg_merge`` against the saved summary; work is
    proportional to the CHUNK, never to history. The MG merge theorem
    (Agarwal et al. 2012) gives the folded summary the same guarantee as
    a batch sketch over the concatenated log: true_count ∈ [lb, lb+err],
    and err ≤ the sum of truncation decrements. With ``capacity`` ≥ the
    stream's distinct-value count the fold is EXACT (err 0) and equals
    batch ``heavy_hitters`` bit-for-bit (the driver-gate contract).

    Durability mirrors ``sessionize_append``: the summary lives in an
    atomically-replaced parquet + ``_HH.json`` pointer; ``run_id`` makes
    re-folding the same chunk a no-op (idempotent resume).
    """
    from ..stages.relational import mg_merge, mg_sketch_dataset

    os.makedirs(state_dir, exist_ok=True)
    runs_path = os.path.join(state_dir, "_HH_RUNS.jsonl")
    run_id = run_id if run_id is not None else str(len(_runs(runs_path)))
    if run_id in _runs(runs_path):
        return heavy_hitters_state_read(state_dir)

    items, counts, err = mg_sketch_dataset(chunk, col, capacity)

    ptr = _hh_pointer(state_dir)
    if ptr is not None:
        if ptr["col"] != col:
            raise ValueError(
                f"heavy_hitters_append: state tracks column {ptr['col']!r}, "
                f"got {col!r}"
            )
        if ptr["capacity"] != capacity:
            raise ValueError(
                "heavy_hitters_append: capacity must stay constant across "
                f"folds (state {ptr['capacity']}, got {capacity})"
            )
        saved = pq_read_table(os.path.join(state_dir, ptr["path"]))
        s_items = np.asarray(saved[col].to_pylist(), object)
        s_counts = saved["lb"].to_numpy(zero_copy_only=False).astype(np.int64)
        items, counts, err = mg_merge(
            (s_items, s_counts, int(ptr["err"])), (items, counts, err), capacity
        )

    order = np.lexsort((items, -counts))
    tbl = pa.table(
        {
            col: pa.array(items[order].tolist()),
            "lb": pa.array(counts[order], pa.int64()),
        }
    )
    rel = f"hh-{run_id}-{uuid.uuid4().hex[:6]}.parquet"
    tmp = os.path.join(state_dir, rel + ".tmp")
    pq_write_table(tbl, tmp)
    os.replace(tmp, os.path.join(state_dir, rel))
    ptr_tmp = os.path.join(state_dir, f".{_HH_PTR}.{uuid.uuid4().hex[:6]}")
    with open(ptr_tmp, "w", encoding="utf-8") as f:
        json.dump(
            {"path": rel, "run": run_id, "err": int(err), "col": col,
             "capacity": int(capacity)},
            f,
        )
    os.replace(ptr_tmp, os.path.join(state_dir, _HH_PTR))
    _record_run(runs_path, run_id)
    return tbl, int(err)


def heavy_hitters_state_read(
    state_dir: str, k: Optional[int] = None
) -> "tuple[pa.Table, int]":
    """Current folded summary (optionally truncated to the top ``k``)."""
    ptr = _hh_pointer(state_dir)
    if ptr is None:
        raise FileNotFoundError(f"no heavy-hitters state under {state_dir}")
    tbl = pq_read_table(os.path.join(state_dir, ptr["path"]))
    if k is not None:
        tbl = tbl.slice(0, k)
    return tbl, int(ptr["err"])


def pq_read_table(path: str) -> pa.Table:
    import pyarrow.parquet as pq

    return pq.read_table(path)


def pq_write_table(tbl: pa.Table, path: str) -> None:
    import pyarrow.parquet as pq

    pq.write_table(tbl, path)


# ---------------------------------------------------------------------------
# Incremental time-decayed sums over an append-only event log
# (round-5 — the exact dyadic-decay buckets of
# ``stages.relational.decayed_sum`` wired into the same durable
# append-state machinery as ``sessionize_append``/``heavy_hitters_append``)
# ---------------------------------------------------------------------------

_DS_PTR = "_DECAY.json"


def _decay_pointer(state_dir: str) -> Optional[dict]:
    path = os.path.join(state_dir, _DS_PTR)
    if not os.path.exists(path):
        return None
    with open(path, encoding="utf-8") as f:
        return json.load(f)


def decayed_sum_append(
    chunk: rd.Dataset,
    state_dir: str,
    key_col: str,
    ts_col: str,
    val_col: str,
    *,
    half_life_us: int,
    max_k: int = 20,
    run_id: Optional[str] = None,
) -> int:
    """Fold one appended event chunk into durable per-key decay-bucket
    state and return the updated ``now_ep``.

    State is a parquet dataset of (key, ep, v_sum) — per-key RAW value
    sums per ``half_life_us`` epoch, compacted so every epoch older than
    ``now_ep − max_k`` collapses into the single clamp bucket
    ``now_ep − max_k`` (exact: clamped epochs share one dyadic weight
    forever under the monotone ``now_ep = max epoch seen``). Per key the
    state is ≤ ``max_k + 1`` rows, independent of history length.

    Per fold: ONE distributed pass over the chunk (per-batch (key, ep)
    integer partials) + one groupby-Sum over saved-state ∪ chunk
    partials — work proportional to chunk + state, never to history; no
    driver-side collection. Chunks may arrive in ANY order (late events
    just land in — or below — the clamp bucket); ``run_id`` makes
    re-folding the same chunk a no-op (idempotent resume).

    Parity contract (tested + driver-gated): reading the folded state
    via ``decayed_sum_state_read`` is int64-identical to batch
    ``decayed_sum`` over the concatenated log at the same ``now_ep``.
    """
    from ray.data.aggregate import Sum

    os.makedirs(state_dir, exist_ok=True)
    runs_path = os.path.join(state_dir, "_DECAY_RUNS.jsonl")
    run_id = run_id if run_id is not None else str(len(_runs(runs_path)))
    ptr = _decay_pointer(state_dir)
    if run_id in _runs(runs_path):
        return int(ptr["now_ep"])
    if ptr is not None and ptr["half_life_us"] != half_life_us:
        raise ValueError(
            "decayed_sum_append: half_life_us must stay constant across "
            f"folds (state {ptr['half_life_us']}, got {half_life_us})"
        )
    if ptr is not None and ptr["max_k"] != max_k:
        raise ValueError(
            "decayed_sum_append: max_k must stay constant across folds "
            f"(state {ptr['max_k']}, got {max_k})"
        )

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    key_col: batch[key_col],
                    "ep": pa.array([], pa.int64()),
                    "v_sum": pa.array([], pa.int64()),
                }
            )
        ts = (
            batch[ts_col]
            .combine_chunks()
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        v = (
            batch[val_col]
            .combine_chunks()
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        ep = ts // half_life_us
        keys = batch[key_col].combine_chunks()
        enc = keys.dictionary_encode()
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((ep, codes))
        sc, se = codes[order], ep[order]
        starts = np.flatnonzero(
            np.concatenate([[True], (sc[1:] != sc[:-1]) | (se[1:] != se[:-1])])
        )
        sums = np.add.reduceat(v[order], starts)
        return pa.table(
            {
                key_col: enc.dictionary.take(pa.array(sc[starts])),
                "ep": pa.array(se[starts], pa.int64()),
                "v_sum": pa.array(sums, pa.int64()),
            }
        )

    parts = chunk.select_columns([key_col, ts_col, val_col]).map_batches(
        partial, batch_format="pyarrow"
    )
    saved_now = int(ptr["now_ep"]) if ptr is not None else None
    if ptr is not None:
        parts = parts.union(
            rd.read_parquet(os.path.join(state_dir, ptr["path"]))
        )
    # partials are bucket-compact (≤ keys × epochs rows) — materialize so
    # the max() probe and the fold below share one chunk scan
    parts = parts.materialize()
    chunk_max = parts.max("ep")
    if chunk_max is None:
        return saved_now if saved_now is not None else 0
    now_ep = max(int(chunk_max), saved_now) if saved_now is not None else int(
        chunk_max
    )
    floor_ep = now_ep - max_k

    def compact(batch: pa.Table) -> pa.Table:
        ep = pc.max_element_wise(batch["ep"], pa.scalar(floor_ep, pa.int64()))
        return batch.set_column(batch.schema.get_field_index("ep"), "ep", ep)

    folded = (
        parts.map_batches(compact, batch_format="pyarrow")
        .groupby([key_col, "ep"])
        .aggregate(Sum("v_sum", alias_name="v_sum"))
    )

    rel = f"decay-{run_id}-{uuid.uuid4().hex[:6]}"
    final = os.path.join(state_dir, rel)
    tmp = final + ".tmp"
    folded.write_parquet(tmp)
    os.replace(tmp, final)
    ptr_tmp = os.path.join(state_dir, f".{_DS_PTR}.{uuid.uuid4().hex[:6]}")
    with open(ptr_tmp, "w", encoding="utf-8") as f:
        json.dump(
            {
                "path": rel,
                "run": run_id,
                "now_ep": int(now_ep),
                "key_col": key_col,
                "half_life_us": int(half_life_us),
                "max_k": int(max_k),
            },
            f,
        )
    os.replace(ptr_tmp, os.path.join(state_dir, _DS_PTR))
    _record_run(runs_path, run_id)
    return int(now_ep)


def decayed_sum_state_read(
    state_dir: str, *, scale_bits: int = 20
) -> rd.Dataset:
    """Finalize the folded decay buckets: (key, decayed) with
    decayed = Σ v_sum · 2^(scale_bits − clip(now_ep − ep, 0, max_k)) —
    the int64 fixed-point view batch ``decayed_sum`` produces."""
    from ray.data.aggregate import Sum

    ptr = _decay_pointer(state_dir)
    if ptr is None:
        raise FileNotFoundError(f"no decayed-sum state under {state_dir}")
    now_ep, max_k, key_col = int(ptr["now_ep"]), int(ptr["max_k"]), ptr["key_col"]

    def weigh(batch: pa.Table) -> pa.Table:
        ep = batch["ep"].to_numpy(zero_copy_only=False)
        v = batch["v_sum"].to_numpy(zero_copy_only=False)
        k = np.clip(now_ep - ep, 0, max_k)
        contrib = v * np.left_shift(
            np.int64(1), (scale_bits - k).astype(np.int64)
        )
        return pa.table(
            {
                key_col: batch[key_col],
                "decayed_part": pa.array(contrib, pa.int64()),
            }
        )

    return (
        rd.read_parquet(os.path.join(state_dir, ptr["path"]))
        .map_batches(weigh, batch_format="pyarrow")
        .groupby(key_col)
        .aggregate(Sum("decayed_part", alias_name="decayed"))
    )

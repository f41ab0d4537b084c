"""Custom stateful streaming operators (``applyInPandasWithState``).

The batch engine runs the reset-aware increments scan
(R/compute_increments.R:82-121) per series inside Arrow-batched
kernels; this module is the Structured Streaming variant: the scan
state (post-reset baseline, previous value, previous timestamp, NA run
length) is carried across micro-batches in the Spark state store, so a
continuously arriving gauge series yields exactly the increments a
batch recompute over the full history would.

Gap semantics are the reference's point-based rule: an inter-point gap
contributes ``floor(gap/period)-1`` missing cadence points to the NA
run, and a run longer than ``max_gap`` points breaks the chain — no NA
spine rows ever materialize in the stream.

Scale: state is one tiny 4-field tuple per series, keyed on the same
``timeseries_id`` the batch shuffle uses — a 1000-executor cluster
distributes the state store across executors with no hot spots, and
the per-batch work is one Arrow exchange per touched series.
"""

from __future__ import annotations

from typing import Iterator, Sequence

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

STATE_SCHEMA = (
    "last_max double, prev_value double, prev_ts_micros bigint, na_run int"
)


def streaming_increments(
    stream: DataFrame,
    keys: Sequence[str] = ("timeseries_id",),
    dt_col: str = "datetime",
    value_col: str = "value",
    reset_drop: float = 10.0,
    min_pos: float = 0.0,
    period_seconds: float | None = None,
    max_gap: int = 0,
) -> DataFrame:
    """Reset-aware increments over a stream, state kept per series.

    Rows within one micro-batch are sorted by ``dt_col`` before the
    scan; cross-batch ordering is the arrival order (the file-source
    landing zone appends monotonically, mirroring the reference's
    high-watermark ingest, R/getNewContinuous.R:469-477).
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from ..operators.increments import scan_increments

    out_schema = T.StructType(
        list(stream.schema.fields) + [T.StructField("increment", T.DoubleType())]
    )

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        if state.exists:
            lm, pv, ptm, nr = state.get
            st = (lm, pv,
                  None if ptm is None else pd.Timestamp(ptm, unit="us"),
                  nr or 0)
        else:
            st = (None, None, None, 0)
        chunks = [p for p in pdfs if len(p)]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True)
            pdf = pdf.sort_values(dt_col).reset_index(drop=True)
            out, st = scan_increments(
                pdf[dt_col], pdf[value_col],
                reset_drop, min_pos, period_seconds, max_gap, st,
            )
            pdf["increment"] = pd.array(out, dtype="float64")
            yield pdf
        lm, pv, pts, nr = st
        state.update((
            lm, pv,
            None if pts is None else int(pd.Timestamp(pts).value // 1000),
            int(nr),
        ))

    return stream.groupBy(*keys).applyInPandasWithState(
        fn, out_schema, STATE_SCHEMA, "append", GroupStateTimeout.NoTimeout
    )


PACK_STATE_SCHEMA = "bin_id bigint, fill bigint"


def streaming_pack(
    stream: DataFrame,
    budget: int,
    shard_col: str = "shard",
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
) -> DataFrame:
    """Next-fit sequence packing over a document stream: the open bin
    (id, fill) persists per shard in the state store, so continuously
    arriving documents pack into exactly the bins a batch run over the
    full corpus would produce (operators/packing.scan_pack is the
    shared recurrence).  Within a micro-batch documents sort by id;
    cross-batch order is arrival order — the same contract as
    streaming_increments."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from ..operators.packing import scan_pack

    out_schema = T.StructType(
        list(stream.schema.fields)
        + [T.StructField("bin_id", T.LongType()),
           T.StructField("bin_offset", T.LongType())]
    )

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        st = tuple(state.get) if state.exists else (0, 0)
        chunks = [p for p in pdfs if len(p)]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True)
            pdf = pdf.sort_values(id_col).reset_index(drop=True)
            bins, offsets, st = scan_pack(
                pdf[token_col].astype("int64"), budget, st
            )
            pdf["bin_id"] = pd.Series(bins, dtype="int64")
            pdf["bin_offset"] = pd.Series(offsets, dtype="int64")
            yield pdf
        state.update(tuple(int(x) for x in st))

    return stream.groupBy(shard_col).applyInPandasWithState(
        fn, out_schema, PACK_STATE_SCHEMA, "append",
        GroupStateTimeout.NoTimeout,
    )


def streaming_hll_distinct(
    stream: DataFrame,
    key_col: str,
    group_col: str = "source",
    p: int = 8,
) -> DataFrame:
    """Streaming distinct-count: the HLL register vector
    (operators/sketch.hll_distinct's layout — 60-bit md5 prefix,
    integer rho) kept as per-group state in applyInPandasWithState.
    State is EXACTLY 2^p ints per group forever (the watermark-free
    bounded-state case: registers never grow with the key stream);
    each micro-batch MAXes new observations into the registers and
    emits the refreshed estimate, so the last emission per group
    equals the batch sketch over the full history — the parity the
    test pins. Update mode; restart-safe via the checkpointed state
    store."""
    import hashlib

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    m = 1 << p
    q_bits = 60 - p

    out_schema = T.StructType([
        T.StructField(group_col, T.StringType()),
        T.StructField("n_registers", T.LongType()),
        T.StructField("s_units", T.LongType()),
        T.StructField("estimate", T.DoubleType()),
    ])
    state_schema = "regs array<int>"

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        regs = list(state.get[0]) if state.exists else [0] * m
        for pdf in pdfs:
            for v in pdf[key_col]:
                h = int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)
                idx = h % m
                w = h // m
                rho = (q_bits - (w.bit_length() - 1)) if w > 0 \
                    else q_bits + 1
                if rho > regs[idx]:
                    regs[idx] = rho
        state.update((regs,))
        n_reg = sum(1 for r in regs if r > 0)
        s_units = sum(1 << (q_bits + 1 - r) for r in regs if r > 0) \
            + (m - n_reg) * (1 << (q_bits + 1))
        alpha = 0.7213 / (1.0 + 1.079 / m)
        raw = alpha * float(m) * float(m) \
            * float(1 << (q_bits + 1)) / s_units
        zeros = m - n_reg
        est = (float(m) * __import__("math").log(float(m) / zeros)
               if raw <= 2.5 * m and zeros > 0 else raw)
        yield pd.DataFrame({
            group_col: [key[0]],
            "n_registers": [n_reg],
            "s_units": [s_units],
            "estimate": [est],
        })

    return stream.groupBy(group_col).applyInPandasWithState(
        fn, out_schema, state_schema, "update",
        GroupStateTimeout.NoTimeout)


def streaming_countmin(
    stream: DataFrame,
    key_col: str,
    d: int = 4,
    w: int = 1024,
) -> DataFrame:
    """Streaming count-min sketch: the d x w counter matrix as
    per-ROW state (operators/sketch.countmin_build's exact layout —
    counter (i, md5(i || '|' || key) % w) increments per key).

    Each record fans out to its d sketch rows map-side (a stateless
    projection), the stream groups by sketch row, and each group's
    state is EXACTLY w bigints forever — the bounded-state invariant:
    the heavy-hitter table never grows with the key stream. Every
    micro-batch emits the refreshed row (counters + checksum), so the
    last emission per row equals the batch sketch over the full
    history, counter-for-counter — the parity the test pins. Update
    mode; restart-safe via the checkpointed state store."""
    import hashlib

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = T.StructType([
        T.StructField("row", T.IntegerType()),
        T.StructField("counters", T.ArrayType(T.LongType())),
        T.StructField("total", T.LongType()),
    ])
    state_schema = "cnt array<long>"

    fanned = stream.select(
        F.explode(F.array(*[F.lit(i) for i in range(d)])).alias("row"),
        F.col(key_col).cast("string").alias("__k"),
    )

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        cnt = list(state.get[0]) if state.exists else [0] * w
        i = key[0]
        for pdf in pdfs:
            for v in pdf["__k"]:
                h = int(hashlib.md5(f"{i}|{v}".encode())
                        .hexdigest()[:15], 16)
                cnt[h % w] += 1
        state.update((cnt,))
        yield pd.DataFrame({
            "row": [i],
            "counters": [list(cnt)],
            "total": [sum(cnt)],
        })

    return fanned.groupBy("row").applyInPandasWithState(
        fn, out_schema, state_schema, "update",
        GroupStateTimeout.NoTimeout)


def streaming_funnel(
    stream: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    max_gap_hours: int = 72,
) -> DataFrame:
    """Online funnel progression: per-user step timestamps as
    applyInPandasWithState state — exactly ``len(steps)`` bigints per
    user forever (bounded: no event history is retained).

    Semantics: arrival-order greedy first-match. Within a micro-batch
    rows process in timestamp order; across batches the state only
    moves FORWARD, so results equal the batch operator
    (operators/funnel.funnel_steps) whenever each user's events arrive
    in timestamp order across batches — the usual at-least-once
    append-log case, and the parity the test pins. A late-arriving
    earlier step is ignored (recomputing would require the full event
    history, which bounded state deliberately does not keep).

    Update mode: a user's refreshed row emits on every batch that
    touches them. Output: (user, t1..tn, steps_completed)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    n = len(steps)
    gap_us = max_gap_hours * 3600 * 1_000_000
    out_fields = [T.StructField("user_id", T.LongType())]
    out_fields += [T.StructField(f"t{i + 1}", T.TimestampType())
                   for i in range(n)]
    out_fields.append(T.StructField("steps_completed", T.IntegerType()))
    out_schema = T.StructType(out_fields)
    state_schema = ", ".join(f"t{i + 1} bigint" for i in range(n))

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        ts_state = list(state.get) if state.exists else [None] * n
        rows = []
        for pdf in pdfs:
            for t, et in zip(pdf[ts_col], pdf[type_col]):
                rows.append((t.value, et))  # pandas Timestamp -> ns
        rows.sort(key=lambda r: r[0])
        for t_ns, et in rows:
            t_us = t_ns // 1000
            for i, s in enumerate(steps):
                if et != s or ts_state[i] is not None:
                    continue
                if i == 0:
                    ts_state[0] = t_us
                else:
                    prev = ts_state[i - 1]
                    if prev is not None and t_us > prev \
                            and t_us <= prev + gap_us:
                        ts_state[i] = t_us
                break
        state.update(tuple(ts_state))
        import datetime as _dt

        out = {"user_id": [key[0]]}
        done = 0
        for i in range(n):
            v = ts_state[i]
            out[f"t{i + 1}"] = [
                None if v is None else
                _dt.datetime.utcfromtimestamp(v / 1_000_000)]
            if v is not None:
                done += 1
        out["steps_completed"] = [done]
        yield pd.DataFrame(out)

    return stream.groupBy(user_col).applyInPandasWithState(
        fn, out_schema, state_schema, "update",
        GroupStateTimeout.NoTimeout)


NEAR_DUP_STATE_SCHEMA = "members array<bigint>, capped boolean"


def streaming_near_dup(
    stream: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 8,
    bands: int = 4,
    shingle_k: int = 3,
    max_bucket: int = 64,
) -> DataFrame:
    """Streaming MinHash/LSH near-dup front-end — the streaming mirror
    of operators/dedup.incremental_lsh_pairs (dedup_stream covers only
    exact hashes).

    Plan shape: map-only MinHash (minhash_signatures_maponly — no
    aggregation may precede a stateful stage) -> band-key explode ->
    ONE applyInPandasWithState keyed on (band, key). State per band
    bucket is a CAPPED member set: at most ``max_bucket`` doc ids;
    when a bucket crosses the cap it collapses to its min-id anchor
    (capped=true) and every later arrival pairs with the anchor only —
    the stateful twin of the batch star cap, so a boilerplate bucket
    holds O(1) state and emits O(1) edges per arrival forever.

    Emission contract (append mode): each micro-batch emits exactly
    the pairs with >= 1 endpoint new to the bucket, (id_a < id_b),
    possibly repeated across bands — DISTINCT of the run's output
    equals the batch ``lsh_candidate_pairs`` of everything ingested,
    provided no bucket crosses the cap mid-run (the incremental
    operator's identical parity contract; connectivity survives in
    all cases because a new-minimum arrival still edges to the stored
    anchor)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from ..operators.dedup import band_key_rows, minhash_signatures_maponly

    sigs = minhash_signatures_maponly(
        stream, id_col, text_col, num_hashes, shingle_k)
    keys = band_key_rows(sigs, id_col, num_hashes, bands)

    out_schema = T.StructType([
        T.StructField("id_a", T.LongType()),
        T.StructField("id_b", T.LongType()),
    ])

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        if state.exists:
            members, capped = list(state.get[0]), bool(state.get[1])
        else:
            members, capped = [], False
        seen = set(members)
        new = []
        for pdf in pdfs:
            for d in pdf[id_col]:
                d = int(d)
                if d not in seen:
                    seen.add(d)
                    new.append(d)
        if not new:
            state.update((members, capped))
            return
        new.sort()
        pairs: list[tuple[int, int]] = []
        if not capped and len(members) + len(new) <= max_bucket:
            cur = list(members)
            for d in new:
                pairs.extend((min(a, d), max(a, d)) for a in cur)
                cur.append(d)
            state.update((sorted(cur), False))
        else:
            # cap crossed (now or earlier): anchor-star emission with
            # O(1) state. A new global minimum re-anchors the bucket
            # but still edges to the old anchor, keeping the
            # component connected.
            anchor = min(members) if members else new[0]
            if not capped:
                # collapse moment: the one-shot star over everything
                # currently known (old members + this batch)
                allm = sorted(set(members) | set(new))
                anchor = allm[0]
                pairs.extend((anchor, x) for x in allm if x != anchor)
            else:
                for d in new:
                    if d != anchor:
                        pairs.append((min(anchor, d), max(anchor, d)))
                anchor = min(anchor, new[0])
            state.update(([anchor], True))
        if pairs:
            yield pd.DataFrame(
                {"id_a": [a for a, _ in pairs],
                 "id_b": [b for _, b in pairs]})

    return keys.groupBy("band", "key").applyInPandasWithState(
        fn, out_schema, NEAR_DUP_STATE_SCHEMA, "append",
        GroupStateTimeout.NoTimeout)


PARAGRAPH_STATE_SCHEMA = "seen boolean"


def streaming_paragraph_dedup(
    stream: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    delim: str = r"\n{2,}",
) -> DataFrame:
    """Streaming keep-first paragraph dedup — the streaming mirror of
    operators/dedup.paragraph_dedup (and the stateful twin of
    incremental_paragraph_dedup's persisted-store probe).

    Plan shape: map-only paragraph explode + fingerprint (no
    aggregation may precede a stateful stage) -> ONE
    applyInPandasWithState keyed on the paragraph fingerprint. State
    per fingerprint is a single boolean — O(1) forever, even for a
    boilerplate paragraph arriving millions of times — so state size
    is bounded by DISTINCT paragraphs, never arrivals.

    Emission contract (append mode): each micro-batch emits the
    fingerprint's FIRST-ever arrival (min (id, pos) within the batch
    that first carries it) as (id, pos, para); later arrivals emit
    nothing. Fed in ascending id order, the run's accumulated output
    equals the kept-paragraph set of the batch operator over
    everything ingested (the parity the streaming test pins);
    downstream reassembly (group by id, order by pos) is a plain
    batch concat, same as the batch operator's.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from ..operators.dedup import _paragraph_rows

    paras = _paragraph_rows(stream, id_col, text_col, delim)

    out_schema = T.StructType([
        T.StructField(id_col, T.LongType()),
        T.StructField("pos", T.IntegerType()),
        T.StructField("para", T.StringType()),
    ])

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        if state.exists:
            return
        first = None
        for pdf in pdfs:
            for row in pdf.itertuples(index=False):
                cand = (int(getattr(row, id_col)), int(row.pos), row.para)
                if first is None or cand[:2] < first[:2]:
                    first = cand
        if first is None:
            return
        state.update((True,))
        yield pd.DataFrame({id_col: [first[0]], "pos": [first[1]],
                            "para": [first[2]]})

    return paras.groupBy("fp").applyInPandasWithState(
        fn, out_schema, PARAGRAPH_STATE_SCHEMA, "append",
        GroupStateTimeout.NoTimeout)


KMV_STATE_SCHEMA = "hashes array<bigint>, keys array<string>"


def streaming_kmv_distinct(
    stream: DataFrame,
    key_col: str,
    group_col: str = "source",
    k: int = 64,
) -> DataFrame:
    """Streaming K-minimum-values sketch — the bounded-state twin of
    operators/sketch.kmv_bottom_k (HLL and count-min already have
    their streaming mirrors; KMV completes the set and is the one
    that also RETURNS sample keys).

    State per group is exactly the k smallest (hash, key) pairs seen
    — merging a micro-batch is union + re-take-k, the same
    mergeability the batch operator's tests pin — so state never
    grows with the stream. Update mode: each batch emits the
    refreshed estimate ((k-1)/v_k, exact count below k); the final
    emission equals the batch sketch over the full history."""
    import hashlib

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = T.StructType([
        T.StructField(group_col, T.StringType()),
        T.StructField("n_kept", T.IntegerType()),
        T.StructField("vk", T.LongType()),
        T.StructField("distinct_estimate", T.DoubleType()),
    ])

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        if state.exists:
            hs, ks = list(state.get[0]), list(state.get[1])
            pairs = dict(zip(ks, hs))
        else:
            pairs = {}
        for pdf in pdfs:
            for v in pdf[key_col]:
                s = str(v)
                if s not in pairs:
                    pairs[s] = int(
                        hashlib.md5(s.encode()).hexdigest()[:15], 16)
        best = sorted(pairs.items(), key=lambda kv: (kv[1], kv[0]))[:k]
        state.update(([h for _, h in best], [s for s, _ in best]))
        n = len(best)
        vk = best[-1][1] if best else 0
        est = (float(n) if n < k
               else float(k - 1) * float(1 << 60) / float(vk))
        yield pd.DataFrame({
            group_col: [key[0]], "n_kept": [n], "vk": [vk],
            "distinct_estimate": [est],
        })

    return stream.groupBy(group_col).applyInPandasWithState(
        fn, out_schema, KMV_STATE_SCHEMA, "update",
        GroupStateTimeout.NoTimeout)

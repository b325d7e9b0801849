"""Driver-gate pipelines over the events table (tumbling windows,
sessionization) — see stages/events.py for the operator designs."""

from __future__ import annotations

import pyarrow as pa
import ray.data

from ..stages.events import hopping_counts, sessionize, windowed_counts


def _events(sf_dir: str) -> ray.data.Dataset:
    return ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type", "value"],
    )


def pricing_summary(sf_dir: str) -> pa.Table:
    """The TPC-H Q1 shape (pricing summary report): per (returnflag,
    linestatus) — row count, integer quantity sum, and charge sums in
    PURE scaled-integer arithmetic. The only float round() is per-column
    decimal→integer recovery (price·100, disc·100, tax·100 — each a
    2-decimal value whose scaled double sits ~1e-9 from an integer, so
    half-even vs half-away can never disagree); every product is then
    exact int64: disc term = cents·(100−disc_bp) in 1e-4 currency units,
    charge term = cents·(100−disc_bp)·(100+tax_bp) in 1e-6 units. No
    float round on a product anywhere on either engine (the r4 hash-fail
    was banker's-vs-half-away on products landing exactly on .5)."""
    import numpy as np

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount", "l_tax"],
    )

    def _partial(b: pa.Table) -> pa.Table:
        qty = b.column("l_quantity").to_numpy(zero_copy_only=False)
        price = b.column("l_extendedprice").to_numpy(zero_copy_only=False)
        disc = b.column("l_discount").to_numpy(zero_copy_only=False)
        tax = b.column("l_tax").to_numpy(zero_copy_only=False)
        price_c = np.round(price * 100.0).astype(np.int64)
        disc_bp = np.round(disc * 100.0).astype(np.int64)
        tax_bp = np.round(tax * 100.0).astype(np.int64)
        disc_e4 = price_c * (100 - disc_bp)
        t = pa.table(
            {
                "l_returnflag": b.column("l_returnflag"),
                "l_linestatus": b.column("l_linestatus"),
                "n_rows": pa.array(np.ones(len(b), dtype=np.int64)),
                "sum_qty": pa.array(np.round(qty).astype(np.int64), type=pa.int64()),
                "sum_base_cents": pa.array(price_c, type=pa.int64()),
                "sum_disc_e4": pa.array(disc_e4, type=pa.int64()),
                "sum_charge_e6": pa.array(
                    disc_e4 * (100 + tax_bp), type=pa.int64()
                ),
            }
        )
        agg = t.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("n_rows", "sum"), ("sum_qty", "sum"), ("sum_base_cents", "sum"),
             ("sum_disc_e4", "sum"), ("sum_charge_e6", "sum")]
        )
        # columns BY NAME: pyarrow's key-vs-aggregate output order has
        # changed across releases (see windowed_counts)
        return pa.table({
            "l_returnflag": agg.column("l_returnflag"),
            "l_linestatus": agg.column("l_linestatus"),
            "n_rows": agg.column("n_rows_sum"),
            "sum_qty": agg.column("sum_qty_sum"),
            "sum_base_cents": agg.column("sum_base_cents_sum"),
            "sum_disc_e4": agg.column("sum_disc_e4_sum"),
            "sum_charge_e6": agg.column("sum_charge_e6_sum"),
        })

    partials = li.map_batches(_partial, batch_format="pyarrow", zero_copy_batch=True)
    t = pa.concat_tables(partials.iter_batches(batch_format="pyarrow"))
    g = t.group_by(["l_returnflag", "l_linestatus"]).aggregate(
        [("n_rows", "sum"), ("sum_qty", "sum"), ("sum_base_cents", "sum"),
         ("sum_disc_e4", "sum"), ("sum_charge_e6", "sum")]
    )
    out = pa.table({
        "l_returnflag": g.column("l_returnflag"),
        "l_linestatus": g.column("l_linestatus"),
        "n_rows": g.column("n_rows_sum"),
        "sum_qty": g.column("sum_qty_sum"),
        "sum_base_cents": g.column("sum_base_cents_sum"),
        "sum_disc_e4": g.column("sum_disc_e4_sum"),
        "sum_charge_e6": g.column("sum_charge_e6_sum"),
    })
    return out.sort_by(
        [("l_returnflag", "ascending"), ("l_linestatus", "ascending")]
    )


def revenue_by_nation(sf_dir: str) -> pa.Table:
    """Classic star-schema analytics over the TPC-H-ish tables (the
    general-join surface of the data-processing side): revenue per nation,
    lineitem ⋈ orders ⋈ customer ⋈ nation.

    Join plan by size: lineitem⋈orders is the big co-partitioned pair —
    a hash-shuffle `Dataset.join` on o_orderkey; customer and nation are
    dimension tables, broadcast once via ray.put and resolved inside
    map_batches (never shuffled). Revenue is the exact scaled integer
    cents·(100−disc_bp) (units 1e-4 currency): both factors are recovered
    per-column from 2-decimal values (never near a .5 boundary), so no
    float round touches a product on either engine and the integer sums
    are hash-exact."""
    import numpy as np

    from ..stages.dedup import drop_empty_blocks

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    )
    import ray as _ray

    ncpu = int(_ray.cluster_resources().get("CPU", 8))
    nparts = max(2, min(16, ncpu))
    left = drop_empty_blocks(li)
    right = drop_empty_blocks(orders)
    if left is None or right is None:
        return pa.table(
            {"n_name": pa.array([], type=pa.string()),
             "revenue_e4": pa.array([], type=pa.int64())}
        )
    joined = left.join(
        right, "inner", num_partitions=nparts,
        on=("l_orderkey",), right_on=("o_orderkey",),
    )

    cust = pa.concat_tables(
        ray.data.read_parquet(
            f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
        ).iter_batches(batch_format="pyarrow")
    )
    nat = pa.concat_tables(
        ray.data.read_parquet(
            f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
        ).iter_batches(batch_format="pyarrow")
    )
    ck = cust.column("c_custkey").to_numpy(zero_copy_only=False).astype(np.int64)
    cn = cust.column("c_nationkey").to_numpy(zero_copy_only=False).astype(np.int64)
    order_c = np.argsort(ck)
    nation_names = {
        int(k): v
        for k, v in zip(nat.column("n_nationkey").to_pylist(), nat.column("n_name").to_pylist())
    }
    dims_ref = _ray.put((ck[order_c], cn[order_c], nation_names))

    def _agg(b: pa.Table) -> pa.Table:
        ckk, cnn, nn = _ray.get(dims_ref)
        cust_k = b.column("o_custkey").to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.searchsorted(ckk, cust_k)
        nk = cnn[pos]  # custkeys are dense FK — always present
        price = b.column("l_extendedprice").to_numpy(zero_copy_only=False)
        disc = b.column("l_discount").to_numpy(zero_copy_only=False)
        price_c = np.round(price * 100.0).astype(np.int64)
        disc_bp = np.round(disc * 100.0).astype(np.int64)
        e4 = price_c * (100 - disc_bp)
        t = pa.table(
            {
                "n_name": pa.array([nn[int(k)] for k in nk], type=pa.string()),
                "revenue_e4": pa.array(e4, type=pa.int64()),
            }
        )
        a = t.group_by(["n_name"]).aggregate([("revenue_e4", "sum")])
        # by name, not positional (pyarrow key/aggregate order varies)
        return pa.table(
            {"n_name": a.column("n_name"), "revenue_e4": a.column("revenue_e4_sum")}
        )

    parts = pa.concat_tables(
        joined.map_batches(_agg, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
    )
    g = parts.group_by(["n_name"]).aggregate([("revenue_e4", "sum")])
    out = pa.table(
        {"n_name": g.column("n_name"), "revenue_e4": g.column("revenue_e4_sum")}
    )
    return out.sort_by("n_name")


def suppliers_by_region(sf_dir: str) -> pa.Table:
    """Dimension rollup exercising the remaining relational tables:
    supplier ⋈ nation ⋈ region counts + integer-cents acctbal sums per
    region — all three sides are dimension-sized, so the whole join is a
    broadcast-map (no shuffle at any scale where dims stay dims)."""
    import numpy as np

    import ray as _ray

    nat = pa.concat_tables(
        ray.data.read_parquet(
            f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_regionkey"]
        ).iter_batches(batch_format="pyarrow")
    )
    reg = pa.concat_tables(
        ray.data.read_parquet(f"{sf_dir}/region.parquet").iter_batches(
            batch_format="pyarrow"
        )
    )
    n2r = dict(
        zip(nat.column("n_nationkey").to_pylist(), nat.column("n_regionkey").to_pylist())
    )
    r2name = dict(
        zip(reg.column("r_regionkey").to_pylist(), reg.column("r_name").to_pylist())
    )
    dims_ref = _ray.put((n2r, r2name))

    def _partial(b: pa.Table) -> pa.Table:
        n2r_, r2n_ = _ray.get(dims_ref)
        nk = b.column("s_nationkey").to_pylist()
        bal = b.column("s_acctbal").to_numpy(zero_copy_only=False)
        cents = np.round(bal * 100.0).astype(np.int64)
        t = pa.table(
            {
                "r_name": pa.array([r2n_[n2r_[k]] for k in nk], type=pa.string()),
                "n_suppliers": pa.array(np.ones(len(b), dtype=np.int64)),
                "sum_acctbal_cents": pa.array(cents, type=pa.int64()),
            }
        )
        a = t.group_by(["r_name"]).aggregate(
            [("n_suppliers", "sum"), ("sum_acctbal_cents", "sum")]
        )
        return pa.table(
            {
                "r_name": a.column("r_name"),
                "n_suppliers": a.column("n_suppliers_sum"),
                "sum_acctbal_cents": a.column("sum_acctbal_cents_sum"),
            }
        )

    parts = pa.concat_tables(
        ray.data.read_parquet(
            f"{sf_dir}/supplier.parquet", columns=["s_nationkey", "s_acctbal"]
        )
        .map_batches(_partial, batch_format="pyarrow", zero_copy_batch=True)
        .iter_batches(batch_format="pyarrow")
    )
    g = parts.group_by(["r_name"]).aggregate(
        [("n_suppliers", "sum"), ("sum_acctbal_cents", "sum")]
    )
    out = pa.table(
        {
            "r_name": g.column("r_name"),
            "n_suppliers": g.column("n_suppliers_sum"),
            "sum_acctbal_cents": g.column("sum_acctbal_cents_sum"),
        }
    )
    return out.sort_by("r_name")


def parts_brand_stats(sf_dir: str) -> pa.Table:
    """Per (brand, type): part count + min/max size — a pure distributed
    group-aggregate over the part table (integer columns; map-side
    combined)."""
    p = ray.data.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_brand", "p_type", "p_size"]
    )

    def _partial(b: pa.Table) -> pa.Table:
        import numpy as np

        t = b.append_column(
            "n_parts", pa.array(np.ones(len(b), dtype=np.int64), type=pa.int64())
        )
        a = t.group_by(["p_brand", "p_type"]).aggregate(
            [("n_parts", "sum"), ("p_size", "min"), ("p_size", "max")]
        )
        return pa.table(
            {
                "p_brand": a.column("p_brand"),
                "p_type": a.column("p_type"),
                "n_parts": a.column("n_parts_sum"),
                "size_min": a.column("p_size_min").cast(pa.int64()),
                "size_max": a.column("p_size_max").cast(pa.int64()),
            }
        )

    parts = pa.concat_tables(
        p.map_batches(_partial, batch_format="pyarrow", zero_copy_batch=True)
        .iter_batches(batch_format="pyarrow")
    )
    g = parts.group_by(["p_brand", "p_type"]).aggregate(
        [("n_parts", "sum"), ("size_min", "min"), ("size_max", "max")]
    )
    out = pa.table(
        {
            "p_brand": g.column("p_brand"),
            "p_type": g.column("p_type"),
            "n_parts": g.column("n_parts_sum"),
            "size_min": g.column("size_min_min"),
            "size_max": g.column("size_max_max"),
        }
    )
    return out.sort_by([("p_brand", "ascending"), ("p_type", "ascending")])


def events_windowed(sf_dir: str) -> pa.Table:
    """Per (1-hour tumbling window, event_type): count + exact integer-cents
    value sum. Map-side combined; only (window, type) partials shuffle."""
    return windowed_counts(_events(sf_dir))


def events_hopping(sf_dir: str) -> pa.Table:
    """Per (1-hour window hopping every 30 min, event_type): count + exact
    integer-cents sum — each event lands in 2 overlapping windows. The
    2x fan-out is absorbed by the per-batch combine; only (window, type)
    partials shuffle (stages/events.hopping_counts)."""
    return hopping_counts(_events(sf_dir))


def events_sessions(sf_dir: str) -> pa.Table:
    """Gap-based (30 min) sessionization per user; session_seq is the 0-based
    session index within the user."""
    return sessionize(_events(sf_dir))


def events_range_join(sf_dir: str) -> pa.Table:
    """Band join: (click, purchase) pairs of the same user with the purchase
    in [click.ts, click.ts + 30 min) — window attribution."""
    from ..stages.relational import range_join_window

    return range_join_window(
        _events(sf_dir), left_type="click", right_type="purchase",
        window_us=30 * 60 * 1_000_000,
    )


def events_asof(sf_dir: str) -> pa.Table:
    """As-of join: each purchase matched to the user's most recent prior
    click (strict (ts, event_id) order; -1 when none)."""
    from ..stages.relational import asof_join_prior

    return asof_join_prior(_events(sf_dir), left_type="purchase", right_type="click")


def events_json_rollup(sf_dir: str) -> pa.Table:
    """Semi-structured field extraction (the ES stored-fields / Spark
    get_json_object shape): each event's `props` column holds a JSON object;
    extract the integer field `k` with a VECTORIZED RE2 kernel
    (pyarrow.compute.extract_regex — no per-row json.loads loop), then
    roll up per event_type: event count + exact integer sum / min / max of
    k, plus how many rows carried no extractable field (null accounting —
    real JSON is ragged). Map-side combined: only (event_type, partials)
    rows shuffle, never the raw JSON strings."""
    import numpy as np
    import pyarrow.compute as pc

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "props"]
    )

    def _isum(codes: np.ndarray, vals: np.ndarray, n: int) -> np.ndarray:
        # exact int64 scatter-add (np.bincount weights would detour
        # through float64 and lose exactness past 2^53)
        out = np.zeros(n, dtype=np.int64)
        np.add.at(out, codes, vals)
        return out

    def _partial(b: pa.Table) -> pa.Table:
        ex = pc.extract_regex(b.column("props"), r'"k"\s*:\s*(?P<v>-?\d+)')
        v = pc.cast(pc.struct_field(ex, "v"), pa.int64())
        miss = pc.is_null(v).to_numpy(zero_copy_only=False)
        # int64 throughout: fill nulls BEFORE to_numpy so no float64 detour
        vi = pc.fill_null(v, 0).to_numpy(zero_copy_only=False).astype(np.int64)
        et = b.column("event_type")
        enc = pc.dictionary_encode(
            et.combine_chunks() if isinstance(et, pa.ChunkedArray) else et
        )
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        ntyp = len(enc.dictionary)
        ok = ~miss
        cnt = np.bincount(codes, minlength=ntyp)
        nmiss = np.bincount(codes[miss], minlength=ntyp)
        ksum = _isum(codes[ok], vi[ok], ntyp)
        kmin = np.full(ntyp, np.iinfo(np.int64).max)
        kmax = np.full(ntyp, np.iinfo(np.int64).min)
        np.minimum.at(kmin, codes[ok], vi[ok])
        np.maximum.at(kmax, codes[ok], vi[ok])
        return pa.table(
            {
                "event_type": enc.dictionary,
                "n_events": pa.array(cnt, type=pa.int64()),
                "n_missing": pa.array(nmiss, type=pa.int64()),
                "k_sum": pa.array(ksum, type=pa.int64()),
                "k_min": pa.array(kmin, type=pa.int64()),
                "k_max": pa.array(kmax, type=pa.int64()),
            }
        )

    parts = ds.map_batches(_partial, batch_format="pyarrow", zero_copy_batch=True)
    agg = pa.concat_tables(parts.iter_batches(batch_format="pyarrow"))
    # final combine: tiny (n_types x blocks) — exact integer merges
    enc = pc.dictionary_encode(agg.column("event_type").combine_chunks())
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    ntyp = len(enc.dictionary)
    n_events = _isum(codes, agg.column("n_events").to_numpy(zero_copy_only=False).astype(np.int64), ntyp)
    n_missing = _isum(codes, agg.column("n_missing").to_numpy(zero_copy_only=False).astype(np.int64), ntyp)
    k_sum = _isum(codes, agg.column("k_sum").to_numpy(zero_copy_only=False).astype(np.int64), ntyp)
    kmin = np.full(ntyp, np.iinfo(np.int64).max)
    kmax = np.full(ntyp, np.iinfo(np.int64).min)
    np.minimum.at(kmin, codes, agg.column("k_min").to_numpy(zero_copy_only=False))
    np.maximum.at(kmax, codes, agg.column("k_max").to_numpy(zero_copy_only=False))
    # groups where every row lacked an extractable k: min/max are NULL
    # (matching the oracle's min(k)/max(k) over an empty set), never the
    # iinfo sentinels the partials seed with
    empty = n_events == n_missing
    t = pa.table(
        {
            "event_type": enc.dictionary,
            "n_events": pa.array(n_events, type=pa.int64()),
            "n_missing": pa.array(n_missing, type=pa.int64()),
            "k_sum": pa.array(k_sum, type=pa.int64()),
            "k_min": pa.array(kmin, type=pa.int64(), mask=empty),
            "k_max": pa.array(kmax, type=pa.int64(), mask=empty),
        }
    )
    return t.sort_by("event_type")

"""CitiBike and Sensors format plugins — vectorized re-expressions of the
reference's remaining ``DataFormatter`` implementations
(``/root/reference/plugin/citibike/CitiBikeFormatter.py:26-124``,
``/root/reference/plugin/sensors/Sensors.py:40-75``), normalizing raw CSV
into typed Arrow event tables plus matching :class:`EngineConfig`\\ s.

Both formats carry no conversation key; like the stocks plugin, the
normalizers add a constant ``stream`` key (reference sequential
semantics) and an ``arrival`` tie-break index, and any payload column
(e.g. ``bikeid``) can be promoted to the partition key for key-local
patterns.
"""

from __future__ import annotations

from typing import Sequence

import pyarrow as pa
import pyarrow.compute as pc

from ..engine import EngineConfig

# the reference's normalized CitiBike payload keys
# (CitiBikeFormatter.py:49-114; legacy schema keys kept verbatim,
# modern started_at/ended_at/member_casual rows mapped onto them)
CITIBIKE_KEYS = ["tripduration", "starttime", "stoptime",
                 "start station id", "end station id", "bikeid",
                 "usertype", "birth year", "gender"]

_DT_FORMATS = ("%Y-%m-%d %H:%M:%S", "%Y-%m-%dT%H:%M:%S",
               "%Y-%m-%d %H:%M:%S.%f", "%Y-%m-%dT%H:%M:%S.%f")


def _parse_dt(col: pa.ChunkedArray) -> pa.Array:
    """Multi-format timestamp parse (the reference tries the same list of
    formats per value); values no format accepts become null."""
    col = pc.cast(col, pa.string())
    out = None
    for fmt in _DT_FORMATS:
        parsed = pc.strptime(col, format=fmt, unit="us",
                             error_is_null=True)
        out = parsed if out is None else pc.coalesce(out, parsed)
    return out


def _safe_int(col) -> pa.Array:
    """Int parse matching the reference's tolerant behavior: non-numeric
    strings (incl. "NULL"/empty) become null instead of raising."""
    s = pc.utf8_trim_whitespace(pc.cast(col, pa.string()))
    mask = pc.match_substring_regex(s, r"^-?[0-9]+$")
    cleaned = pc.if_else(pc.fill_null(mask, False), s, None)
    return pc.cast(cleaned, pa.int64())


def normalize_citibike(batch: pa.Table) -> pa.Table:
    """Vectorized CitiBike trip normalizer supporting the legacy and the
    modern (``started_at``/``ended_at``/``member_casual``) schemas, same
    field mapping as the reference formatter."""
    names = {c.strip().lower(): c for c in batch.column_names}
    modern = "started_at" in names and "ended_at" in names

    def col(*cands):
        for c in cands:
            if c in names:
                return batch[names[c]]
        return pa.nulls(batch.num_rows, pa.string())

    if modern:
        start = _parse_dt(col("started_at"))
        stop = _parse_dt(col("ended_at"))
        dur = pc.cast(pc.max_element_wise(
            pc.divide(pc.cast(pc.subtract(pc.cast(stop, pa.int64()),
                                          pc.cast(start, pa.int64())),
                              pa.float64()), 1_000_000.0), 0.0),
            pa.int64(), safe=False)
        mc = pc.utf8_lower(pc.cast(col("member_casual"), pa.string()))
        usertype = pc.if_else(
            pc.equal(mc, "member"), pa.scalar("Subscriber"),
            pc.if_else(pc.equal(mc, "casual"), pa.scalar("Customer"),
                       pa.scalar(None, pa.string())))
        out = {
            "tripduration": dur,
            "starttime": start,
            "stoptime": stop,
            "start station id": _safe_int(pc.cast(
                col("start_station_id"), pa.string())),
            "end station id": _safe_int(pc.cast(
                col("end_station_id"), pa.string())),
            "bikeid": _safe_int(pc.cast(col("bike_id", "bikeid"),
                                        pa.string())),
            "usertype": usertype,
            "birth year": pa.nulls(batch.num_rows, pa.int64()),
            "gender": pa.nulls(batch.num_rows, pa.int64()),
        }
    else:
        out = {
            "tripduration": _safe_int(pc.cast(col("tripduration"),
                                              pa.string())),
            "starttime": _parse_dt(col("starttime")),
            "stoptime": _parse_dt(col("stoptime")),
            "start station id": _safe_int(pc.cast(
                col("start station id"), pa.string())),
            "end station id": _safe_int(pc.cast(
                col("end station id"), pa.string())),
            "bikeid": _safe_int(pc.cast(col("bikeid"), pa.string())),
            "usertype": pc.cast(col("usertype"), pa.string()),
            "birth year": _safe_int(pc.cast(col("birth year"),
                                            pa.string())),
            "gender": _safe_int(pc.cast(col("gender"), pa.string())),
        }
    table = pa.table(out)
    # event type: every data row is a BikeTrip
    # (CitiBikeEventTypeClassifier, CitiBikeFormatter.py:18-23)
    table = table.append_column(
        "event_type", pa.array(["BikeTrip"] * batch.num_rows, pa.string()))
    table = table.append_column(
        "stream", pa.array(["s"] * batch.num_rows, pa.string()))
    table = table.append_column(
        "arrival", pa.array(range(batch.num_rows), pa.int64()))
    return table


def citibike_table(lines: Sequence[str]) -> pa.Table:
    """Parses header-led CitiBike CSV lines into the normalized event
    table (tests / tiny streams)."""
    import io
    from pyarrow import csv as pacsv
    data = io.BytesIO("\n".join(lines).encode())
    raw = pacsv.read_csv(data, convert_options=pacsv.ConvertOptions(
        column_types=None))
    return normalize_citibike(raw)


def read_citibike_csv(paths):
    """CitiBike CSV files → normalized event Dataset (per-file parse so
    ``arrival`` reflects true file order, like ``read_stocks_csv``)."""
    import io
    import ray.data as rd
    from pyarrow import csv as pacsv

    def parse_file(batch: pa.Table) -> pa.Table:
        tables = []
        for blob in batch["bytes"].to_pylist():
            t = pacsv.read_csv(io.BytesIO(blob))
            tables.append(normalize_citibike(t))
        return pa.concat_tables(tables)

    ds = rd.read_binary_files(paths)
    return ds.map_batches(parse_file, batch_format="pyarrow", batch_size=1)


def citibike_config(num_partitions: int = 1,
                    key_col: str = "stream") -> EngineConfig:
    """CitiBike engine config: constant event type ``BikeTrip``; promote
    ``key_col`` (e.g. ``"bikeid"``) for key-local patterns."""
    return EngineConfig(key_col=key_col, ts_col="starttime",
                        type_col="event_type", order_cols=("arrival",),
                        num_partitions=num_partitions)


# ---------------------------------------------------------------------------
# Sensors

SENSORS_COMMON = ["SensorType", "TimeStamp", "Amplitude"]
SENSORS_KEYS = {
    "PressTemp": SENSORS_COMMON + ["Pressure", "Temperature"],
    "Accelerometer": SENSORS_COMMON + ["AccX", "AccY", "AccZ"],
    "Magnetometer": SENSORS_COMMON + ["MagX", "MagY", "MagZ"],
}
_SENSOR_NUMERIC = sorted({k for keys in SENSORS_KEYS.values()
                          for k in keys[2:]})


def sensors_table(lines: Sequence[str]) -> pa.Table:
    """Parses Sensors-format lines (``SensorType,TimeStamp,Amplitude,…``
    with a per-type column tail) into one unified event table; columns a
    type lacks are null, numeric fields parsed like the reference's
    ``str_to_number`` (Sensors.py:58-66)."""
    rows = []
    for i, line in enumerate(lines):
        parts = line.strip().split(",")
        if not parts or parts[0] not in SENSORS_KEYS:
            continue
        keys = SENSORS_KEYS[parts[0]]
        row = dict(zip(keys, parts))
        row["arrival"] = i
        rows.append(row)
    fields = [("SensorType", pa.string()), ("TimeStamp", pa.string())] + \
        [(k, pa.float64()) for k in _SENSOR_NUMERIC] + \
        [("arrival", pa.int64())]
    cols = {}
    for name, typ in fields:
        vals = []
        for row in rows:
            v = row.get(name)
            if typ == pa.float64() and v is not None:
                try:
                    v = float(v)
                except ValueError:
                    v = None
            vals.append(v)
        cols[name] = pa.array(vals, typ)
    table = pa.table(cols)
    # "%m/%d/%Y %H:%M:%S" per the reference (Sensors.py:68-75)
    ts = pc.strptime(table["TimeStamp"], format="%m/%d/%Y %H:%M:%S",
                     unit="us", error_is_null=True)
    table = table.set_column(table.column_names.index("TimeStamp"),
                             "TimeStamp", ts)
    return table.append_column(
        "stream", pa.array(["s"] * table.num_rows, pa.string()))


def find_target_stations(table: pa.Table, top: int = 3,
                         mode: str = "balanced"):
    """Target-station selection for load-shedding experiments — the
    vectorized equivalent of the reference's
    ``scripts/find_targets.py:35-205`` over a normalized CitiBike table:

    * count CHAIN terminals: per bike (ordered by start time), a trip
      chains when it starts where the previous trip ended within one
      hour; its end station is a chainable terminal;
    * select ``top`` stations by ``mode``: ``rare`` = fewest chains,
      ``common`` = most, ``balanced`` = middle third;
    * fall back to stations appearing as both start and end (combined
      counts, same mode logic), then to raw end counts.

    Ties break by station id for determinism (the reference inherits
    Counter insertion order)."""
    import polars as pl
    assert mode in ("balanced", "rare", "common")
    df = pl.from_arrow(table.select(
        ["bikeid", "starttime", "stoptime",
         "start station id", "end station id"]))
    df = df.sort(["bikeid", "starttime"])
    prev_end = pl.col("end station id").shift(1).over("bikeid")
    prev_stop = pl.col("stoptime").shift(1).over("bikeid")
    gap = (pl.col("starttime") - prev_stop).dt.total_seconds()
    chained = df.filter(
        (prev_end == pl.col("start station id"))
        & gap.is_between(0, 3600)
        & pl.col("end station id").is_not_null())
    chain_counts = (chained.group_by("end station id")
                    .agg(pl.len().alias("n"))
                    .drop_nulls().sort(["n", "end station id"]))

    def pick(items, want):
        # items: list[(station, count)] ascending by (count, station)
        if mode == "common":
            items = items[::-1]
        elif mode == "balanced" and len(items) > want:
            items = items[len(items) // 3: 2 * len(items) // 3]
        return [s for s, _ in items[:want]]

    chosen = pick(list(chain_counts.iter_rows()), top)
    if len(chosen) < top:
        counts = (df.group_by("start station id")
                  .agg(pl.len().alias("s"))
                  .rename({"start station id": "sid"})
                  .join(df.group_by("end station id")
                        .agg(pl.len().alias("e"))
                        .rename({"end station id": "sid"}), on="sid")
                  .drop_nulls()
                  .with_columns((pl.col("s") + pl.col("e")).alias("n"))
                  .sort(["n", "sid"]))
        extra = pick([(r[0], r[3]) for r in counts.iter_rows()],
                     top - len(chosen))
        chosen.extend(s for s in extra if s not in chosen)
    if len(chosen) < top:
        ends = (df.group_by("end station id").agg(pl.len().alias("n"))
                .drop_nulls().sort(["n", "end station id"],
                                   descending=[True, False]))
        for s, _ in ends.iter_rows():
            if s not in chosen:
                chosen.append(s)
            if len(chosen) >= top:
                break
    return chosen[:top]


def sensors_config(num_partitions: int = 1) -> EngineConfig:
    """Sensors engine config: event type = the sensor type
    (SensorsEventTypeClassifier, Sensors.py:40-47)."""
    return EngineConfig(key_col="stream", ts_col="TimeStamp",
                        type_col="SensorType", order_cols=("arrival",),
                        num_partitions=num_partitions)

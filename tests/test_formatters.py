"""CitiBike + Sensors formatter plugins: normalization parity with the
reference formatters (plugin/citibike/CitiBikeFormatter.py:26-124,
plugin/sensors/Sensors.py:40-75) and end-to-end CEP evaluation over the
normalized tables.  Pure Python — no Ray needed."""

from datetime import datetime

import pyarrow as pa

from opencep_ray import (Col, GreaterThanCondition, Pattern, Primitive,
                         Seq, SmallerThanCondition)
from opencep_ray.engine import CEP
from opencep_ray.sources.formatters import (citibike_config, citibike_table,
                                            sensors_config, sensors_table)

LEGACY_HEADER = ('"tripduration","starttime","stoptime","start station id",'
                 '"start station name","start station latitude",'
                 '"start station longitude","end station id",'
                 '"end station name","end station latitude",'
                 '"end station longitude","bikeid","usertype",'
                 '"birth year","gender"')

LEGACY_ROWS = [
    '"520","2014-01-01 00:00:06","2014-01-01 00:08:46","2009","A","40.0",'
    '"-74.0","212","B","40.1","-74.1","16085","Subscriber","1982","1"',
    '"303","2014-01-01 00:00:21","2014-01-01 00:05:24","212","B","40.1",'
    '"-74.1","2009","A","40.0","-74.0","16085","Subscriber","1990","2"',
    '"NULL","2014-01-01 00:01:00","2014-01-01 00:02:00","300","C","40.2",'
    '"-74.2","301","D","40.3","-74.3","777","Customer","NULL","0"',
]

MODERN_HEADER = ("ride_id,rideable_type,started_at,ended_at,"
                 "start_station_name,start_station_id,end_station_name,"
                 "end_station_id,start_lat,start_lng,end_lat,end_lng,"
                 "member_casual")

MODERN_ROWS = [
    "R1,classic,2023-05-01 10:00:00,2023-05-01 10:10:00,A,2009,B,212,"
    "40.0,-74.0,40.1,-74.1,member",
    "R2,electric,2023-05-01 10:01:00,2023-05-01 10:04:00,B,212,A,2009,"
    "40.1,-74.1,40.0,-74.0,casual",
]


def test_citibike_legacy_normalization():
    t = citibike_table([LEGACY_HEADER] + LEGACY_ROWS)
    assert t.num_rows == 3
    assert t["tripduration"].to_pylist() == [520, 303, None]
    assert t["start station id"].to_pylist() == [2009, 212, 300]
    assert t["bikeid"].to_pylist() == [16085, 16085, 777]
    assert t["usertype"].to_pylist() == ["Subscriber", "Subscriber",
                                         "Customer"]
    assert t["birth year"].to_pylist() == [1982, 1990, None]
    assert t["starttime"][0].as_py() == datetime(2014, 1, 1, 0, 0, 6)
    assert t["event_type"].to_pylist() == ["BikeTrip"] * 3


def test_citibike_modern_schema_mapping():
    t = citibike_table([MODERN_HEADER] + MODERN_ROWS)
    assert t["tripduration"].to_pylist() == [600, 180]
    assert t["usertype"].to_pylist() == ["Subscriber", "Customer"]
    assert t["start station id"].to_pylist() == [2009, 212]
    assert t["birth year"].to_pylist() == [None, None]


def test_citibike_cep_end_to_end():
    """The course hot-path shape: a trip ending where a later one starts,
    evaluated through the batch engine over the normalized table."""
    t = citibike_table([LEGACY_HEADER] + LEGACY_ROWS)
    p = Pattern(Seq(Primitive("BikeTrip", "a"), Primitive("BikeTrip", "b")),
                GreaterThanCondition(Col("a", "bikeid"), Col("b", "bikeid")),
                window=3600)
    out = CEP(p, citibike_config()).run_table(t)
    # bike 777's trip follows both 16085 trips within the window
    assert out.num_rows == 2
    for row in out["match_events"].to_pylist():
        assert row[0]["bikeid"] > row[1]["bikeid"]


SENSOR_LINES = [
    "PressTemp,01/02/2020 10:00:00,1.5,1013.2,21.7",
    "Accelerometer,01/02/2020 10:00:01,0.2,0.1,0.2,9.8",
    "Magnetometer,01/02/2020 10:00:02,0.8,10.0,20.0,30.0",
    "PressTemp,01/02/2020 10:00:03,1.9,1014.0,22.1",
]


def test_sensors_normalization():
    t = sensors_table(SENSOR_LINES)
    assert t.num_rows == 4
    assert t["SensorType"].to_pylist() == ["PressTemp", "Accelerometer",
                                           "Magnetometer", "PressTemp"]
    assert t["Pressure"].to_pylist()[0] == 1013.2
    assert t["AccZ"].to_pylist()[1] == 9.8
    assert t["MagY"].to_pylist()[2] == 20.0
    assert t["Pressure"].to_pylist()[1] is None
    assert t["TimeStamp"][0].as_py() == datetime(2020, 1, 2, 10, 0, 0)


def test_sensors_cep_end_to_end():
    t = sensors_table(SENSOR_LINES)
    p = Pattern(Seq(Primitive("PressTemp", "a"), Primitive("PressTemp", "b")),
                SmallerThanCondition(Col("a", "Temperature"),
                                     Col("b", "Temperature")),
                window=60)
    out = CEP(p, sensors_config()).run_table(t)
    assert out.num_rows == 1


def test_find_target_stations_chain_detection():
    """Reference scripts/find_targets.py semantics: chainable terminals
    (same bike, station continuity, within 1h) dominate selection."""
    from opencep_ray.sources.formatters import find_target_stations
    rows = [
        # bike 1 chains A->B then B->C (C is a chain terminal), then C->B
        ("100", "2014-01-01 00:00:00", "2014-01-01 00:10:00", "1", "2"),
        ("100", "2014-01-01 00:20:00", "2014-01-01 00:30:00", "2", "3"),
        ("100", "2014-01-01 00:40:00", "2014-01-01 00:50:00", "3", "2"),
        # bike 2 chains 1->2 twice -> terminal 2 has 2 chains
        ("200", "2014-01-01 01:00:00", "2014-01-01 01:10:00", "5", "6"),
        ("200", "2014-01-01 01:20:00", "2014-01-01 01:30:00", "6", "2"),
        ("200", "2014-01-01 01:40:00", "2014-01-01 01:50:00", "2", "2"),
        # bike 3: gap > 1h, NOT a chain
        ("300", "2014-01-01 02:00:00", "2014-01-01 02:10:00", "7", "8"),
        ("300", "2014-01-01 04:00:00", "2014-01-01 04:10:00", "8", "9"),
    ]
    header = ('"tripduration","starttime","stoptime","start station id",'
              '"start station name","start station latitude",'
              '"start station longitude","end station id",'
              '"end station name","end station latitude",'
              '"end station longitude","bikeid","usertype",'
              '"birth year","gender"')
    lines = [header] + [
        f'"600","{st}","{et}","{s}","A","0","0","{e}","B","0","0",'
        f'"{b}","Subscriber","1980","1"'
        for b, st, et, s, e in rows]
    t = citibike_table(lines)
    # chain terminals: 3 (1x, bike1), 2 (1x bike1 + 2x bike2 = 3x)
    common = find_target_stations(t, top=2, mode="common")
    assert common[0] == 2            # most-chained terminal
    rare = find_target_stations(t, top=1, mode="rare")
    assert rare == [3]
    balanced = find_target_stations(t, top=3, mode="balanced")
    assert len(balanced) == 3        # falls through to overlap/end counts

#!/usr/bin/env python3
"""Golden-bytes generator for the Confluent Avro wire format.

Writes Confluent-framed Avro messages (magic byte 0x0 + 4-byte
big-endian schema id + Avro binary body) EXACTLY as the reference's
producer emits them (health_simulator.py:185-191 via AvroSerializer),
using a hand-written pure-stdlib Avro binary encoder implemented
straight from the public Avro 1.11 spec — intentionally independent of
both org.apache.avro (which graft's codec uses) and confluent_kafka
(which the reference uses), so a framing or field-order bug in graft's
decoder cannot be masked by a shared library.

Two fixture sets under src/test/resources/golden_avro/:
  ref_NN.bin    — the reference's on-the-wire schema (health_simulator
                  AVRO_SCHEMA: no event_time field; event time rides the
                  Kafka record timestamp)
  graft_NN.bin  — graft's superset schema (event_time long in-body, the
                  documented record-timestamp stand-in)
plus expected.json with the field values each message must decode to.

Run once; fixtures are checked in. Deterministic (fixed values, no RNG).
"""
import json
import os
import struct

OUT = os.path.join(os.path.dirname(__file__), "..",
                   "src", "test", "resources", "golden_avro")


def zigzag(n: int) -> bytes:
    """Avro int/long: zigzag then varint (spec: binary encoding)."""
    u = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def avro_string(s: str) -> bytes:
    b = s.encode("utf-8")
    return zigzag(len(b)) + b


def avro_float(f: float) -> bytes:
    return struct.pack("<f", f)  # IEEE754 single, little-endian


def body_ref(e: dict) -> bytes:
    """Reference wire schema, fields in declaration order."""
    return (avro_string(e["event_id"]) + zigzag(e["patient_id"]) +
            avro_string(e["device_type"]) + zigzag(e["battery_level"]) +
            avro_string(e["sensor_status"]) +
            zigzag(e["heart_rate"]) + zigzag(e["spo2"]) +
            zigzag(e["systolic"]) + zigzag(e["diastolic"]) +
            avro_float(e["body_temperature_c"]))


def frame(body: bytes, schema_id: int) -> bytes:
    return b"\x00" + struct.pack(">i", schema_id) + body


# Deterministic corpus: values drawn from the simulator's domains
# (DEVICE_TYPES/SENSOR_STATUS health_simulator.py:18-19, allowed vitals
# grids), including edge values that stress zigzag (0, negative deltas
# impossible here, multi-byte varints) and UTF-8 multibyte.
EVENTS = [
    dict(event_id="a1b2c3d4", patient_id=7, device_type="wearable_v4",
         battery_level=95, sensor_status="stable", heart_rate=72,
         spo2=98, systolic=120, diastolic=80, body_temperature_c=36.6,
         event_time_ms=1755216000000),
    dict(event_id="ffffffff", patient_id=0, device_type="wearable_v2",
         battery_level=0, sensor_status="offline", heart_rate=20,
         spo2=85, systolic=90, diastolic=60, body_temperature_c=35.0,
         event_time_ms=0),
    dict(event_id="0e9d8c7b", patient_id=123456, device_type="wearable_v3",
         battery_level=100, sensor_status="noisy", heart_rate=185,
         spo2=100, systolic=180, diastolic=110, body_temperature_c=40.25,
         event_time_ms=1755216123456),
    # multibyte UTF-8 event id (spec: strings are UTF-8 byte-length
    # prefixed, not char-length)
    dict(event_id="idé-β42", patient_id=2147483647, device_type="wearable_v4",
         battery_level=1, sensor_status="stable", heart_rate=65,
         spo2=97, systolic=110, diastolic=70, body_temperature_c=36.0,
         event_time_ms=1755216999999),
]


def main():
    os.makedirs(OUT, exist_ok=True)
    for i, e in enumerate(EVENTS):
        with open(os.path.join(OUT, "ref_%02d.bin" % i), "wb") as f:
            f.write(frame(body_ref(e), schema_id=100042 + i))
        with open(os.path.join(OUT, "graft_%02d.bin" % i), "wb") as f:
            f.write(frame(body_ref(e) + zigzag(e["event_time_ms"]),
                          schema_id=1))
    with open(os.path.join(OUT, "expected.json"), "w") as f:
        json.dump(EVENTS, f, indent=1)
    print("wrote", len(EVENTS) * 2, "fixtures to", OUT)


if __name__ == "__main__":
    main()

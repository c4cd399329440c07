"""Reference-faithful sensor fixture (FIXTURES.md §1): deterministic pure
function of (seed, row index), mirroring the generator distribution at
`random-data-generator/random_data_generator.py:21-41` — 1 s cadence per
sensor, p=0.5 emission (gaps are essential), temp uniform 10-180,
status from the temp thresholds."""

from __future__ import annotations

import random


def sensor_readings(
    seed: int = 42,
    sensors: int = 10,
    span_seconds: int = 120,
    base_ms: int = 1_700_000_000_000,
) -> list[dict]:
    rng = random.Random(seed)
    rows = []
    for tick in range(span_seconds):
        for s in range(sensors):
            if rng.random() >= 0.5:
                continue
            temperature = float(round(10 + rng.random() * 170))
            if temperature > 160:
                status = "ERROR"
            elif temperature > 140 or rng.random() < 0.2:
                status = rng.choice(["WARNING", "ERROR"])
            else:
                status = "OK"
            rows.append(
                {
                    "sensor_id": f"sensor-{s:02d}",
                    "temperature": temperature,
                    "status": status,
                    "event_time": base_ms + tick * 1000 + rng.randrange(1000),
                }
            )
    return rows

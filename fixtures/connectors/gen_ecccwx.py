"""Generate canned weathercan-style tables for the ECCC weather
connector (hourly with `time`; daily with only `date`).

Run from the repo root:  python fixtures/connectors/gen_ecccwx.py
"""

import csv
import math
import os
from datetime import datetime, timedelta

HERE = os.path.dirname(os.path.abspath(__file__))


def main():
    with open(os.path.join(HERE, "ecccwx_hourly_50430.csv"), "w",
              newline="") as f:
        w = csv.writer(f)
        w.writerow(["station_name", "station_id", "date", "time",
                    "temp", "temp_dew", "rel_hum", "wind_dir", "wind_spd"])
        t0 = datetime(2024, 3, 1, 0, 0)
        for i in range(60):
            t = t0 + timedelta(hours=i)
            temp = "" if i % 17 == 5 else round(-5 + 8 * math.sin(i / 7.0), 1)
            wd = "" if i % 13 == 2 else (i * 3) % 36
            w.writerow(["WHITEHORSE A", 50430, t.date().isoformat(),
                        t.strftime("%Y-%m-%d %H:%M:%S"),
                        temp, round(-8 + i * 0.1, 1), 60 + i % 30, wd,
                        (i * 7) % 45])
    with open(os.path.join(HERE, "ecccwx_daily_50430.csv"), "w",
              newline="") as f:
        w = csv.writer(f)
        w.writerow(["station_name", "station_id", "date",
                    "mean_temp", "total_precip"])
        d0 = datetime(2024, 3, 1)
        for i in range(10):
            d = d0 + timedelta(days=i)
            w.writerow(["WHITEHORSE A", 50430, d.date().isoformat(),
                        round(-4 + i * 0.7, 1),
                        "" if i == 4 else round(i * 0.3, 1)])


if __name__ == "__main__":
    main()

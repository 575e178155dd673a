"""Measure the FULL production device path at north-star scale with the
tamper-proof chained harness (VERDICT r4 next-#1): detect (1080p ingest,
device resize) + per-camera filter tables + zone SATs + packed transport +
device overlay render — batch 32, C=2 active labels — as ONE data-chained
program. Publishes the record to DEVICE_PATH.jsonl.

timeout 3000 python -u - < scripts/bench_device_path.py   (from /root/repo)
"""

import json
import os
import sys

sys.path.insert(0, os.getcwd())

BATCH = int(os.environ.get('DEVICE_PATH_BATCH', 32))


def main():
    from watsor_tpu.timing import measure_production_device_path

    def log(msg):
        print('device_path: ' + msg, file=sys.stderr, flush=True)

    rec = measure_production_device_path(batch=BATCH, log=log)
    with open('DEVICE_PATH.jsonl', 'a') as f:
        f.write(json.dumps(rec) + '\n')
    print(json.dumps(rec))


if __name__ == '__main__':
    main()

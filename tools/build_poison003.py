"""Poisoned-corpus builder #3: adversarial EVENTS (driver-side tooling).
Streaming/watermark/session/json-parse paths — null ts, null user_id,
null value, null/malformed/deep props — appended to a copy of sf0.001.
Usage: python3 tools/build_poison003.py [destDir]
"""
import pyarrow as pa, pyarrow.parquet as pq, shutil, os, sys, datetime as dt
src=(sys.argv[2] if len(sys.argv)>2 else '/root/testdata/sf0.001')
dst=(sys.argv[1] if len(sys.argv)>1 else '/tmp/poison003')
os.makedirs(dst, exist_ok=True)
for t in ['region','nation','customer','supplier','part','orders','lineitem',
          'documents','embeddings']:
    shutil.copy(f'{src}/{t}.parquet', f'{dst}/{t}.parquet')
e = pq.read_table(f'{src}/events.parquet')
maxid = max(e.column('event_id').to_pylist())
t0 = dt.datetime(2024, 1, 15, 12, 0, 0)
rows = [
    # (ts, user_id, event_type, value, props)
    (None, 7, 'click', 1.5, '{"k": 1}'),          # null event time
    (t0, None, 'click', 2.5, '{"k": 2}'),          # null session key
    (t0, 9, None, 3.5, '{"k": 3}'),                # null type (group key)
    (t0, 11, 'purchase', None, '{"k": 4}'),        # null measure
    (t0, 13, 'click', 4.5, None),                  # null props
    (t0, 15, 'click', 5.5, '{broken json'),        # malformed props
    (t0, 17, 'click', 6.5, '{"k": {"deep": [1,2,{"x": "y"}]}}'),  # nested
    (t0, 19, 'click', 7.5, ''),                    # empty props
]
extra = pa.table({
 'event_id': [maxid+1+i for i in range(len(rows))],
 'ts': [r[0] for r in rows],
 'user_id': [r[1] for r in rows],
 'event_type': [r[2] for r in rows],
 'value': [r[3] for r in rows],
 'props': [r[4] for r in rows],
}, schema=pa.schema([(f.name, f.type) for f in e.schema]))
pq.write_table(pa.concat_tables([e, extra.cast(e.schema)]), f'{dst}/events.parquet')
print('poison003 built:', sorted(os.listdir(dst)))

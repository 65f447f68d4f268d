"""Poisoned-corpus builder #5: IEEE-special floats (driver-side tooling).
NaN / +-Infinity / -0.0 in embeddings, lineitem measures, and event
values — ordering, grouping, and aggregation semantics differ between
engines on these, so the sweep separates ABORTS (must fix) from
documented engine divergences. Usage: python3 tools/build_poison005.py [destDir]
"""
import pyarrow as pa, pyarrow.parquet as pq, shutil, os, sys, datetime as dt
src=(sys.argv[2] if len(sys.argv)>2 else '/root/testdata/sf0.001')
dst=(sys.argv[1] if len(sys.argv)>1 else '/tmp/poison005')
os.makedirs(dst, exist_ok=True)
for t in ['region','nation','customer','supplier','part','orders','documents']:
    shutil.copy(f'{src}/{t}.parquet', f'{dst}/{t}.parquet')
nan, inf = float('nan'), float('inf')

li = pq.read_table(f'{src}/lineitem.parquet')
mx = max(li.column('l_orderkey').to_pylist())
t0 = dt.datetime(1995, 6, 15)
lrows = {
 'l_orderkey': [mx+1, mx+1, mx+2],
 'l_partkey': [1, 2, 3], 'l_suppkey': [1, 1, 1],
 'l_linenumber': [1, 2, 1],
 'l_quantity': [nan, inf, -0.0],
 'l_extendedprice': [100.0, -inf, 50.0],
 'l_discount': [0.05, 0.06, nan],
 'l_tax': [0.01, 0.02, 0.03],
 'l_returnflag': ['A', 'N', 'R'], 'l_linestatus': ['O', 'F', 'O'],
 'l_shipdate': [t0, t0, t0],
}
ex = pa.table(lrows, schema=pa.schema([(f.name, f.type) for f in li.schema]))
pq.write_table(pa.concat_tables([li, ex.cast(li.schema)]), f'{dst}/lineitem.parquet')

e = pq.read_table(f'{src}/events.parquet')
emx = max(e.column('event_id').to_pylist())
ts = dt.datetime(2024, 1, 15, 12, 0)
erows = {
 'event_id': [emx+1, emx+2, emx+3],
 'ts': [ts, ts, ts], 'user_id': [7, 9, 11],
 'event_type': ['click', 'click', 'purchase'],
 'value': [nan, inf, -0.0],
 'props': ['{"k": 1}', '{"k": 2}', '{"k": 3}'],
}
eex = pa.table(erows, schema=pa.schema([(f.name, f.type) for f in e.schema]))
pq.write_table(pa.concat_tables([e, eex.cast(e.schema)]), f'{dst}/events.parquet')

em = pq.read_table(f'{src}/embeddings.parquet')
dim = len(em.column('embedding')[0])
vmx = max(em.column('vec_id').to_pylist())
vrows = {
 'vec_id': [vmx+1, vmx+2],
 'embedding': [[nan]*dim, [inf] + [0.0]*(dim-1)],
 'label': [0, 1],
}
vex = pa.table(vrows, schema=pa.schema([(f.name, f.type) for f in em.schema]))
pq.write_table(pa.concat_tables([em, vex.cast(em.schema)]), f'{dst}/embeddings.parquet')
print('poison005 built')

"""Poisoned-corpus builder #4: adversarial RELATIONAL rows (driver-side).
Null join/group keys, null measures/dates, and overflow-scale numerics in
lineitem/orders/customer — the q_* relational layer's degenerate inputs.
Usage: python3 tools/build_poison004.py [destDir]
"""
import pyarrow as pa, pyarrow.parquet as pq, shutil, os, sys, datetime as dt
src=(sys.argv[2] if len(sys.argv)>2 else '/root/testdata/sf0.001')
dst=(sys.argv[1] if len(sys.argv)>1 else '/tmp/poison004')
os.makedirs(dst, exist_ok=True)
for t in ['region','nation','supplier','part','events','documents','embeddings']:
    shutil.copy(f'{src}/{t}.parquet', f'{dst}/{t}.parquet')

li = pq.read_table(f'{src}/lineitem.parquet')
mx = max(li.column('l_orderkey').to_pylist())
t0 = dt.datetime(1995, 6, 15)
lrows = {
 'l_orderkey':      [None, mx+1, mx+1, mx+2, mx+2],
 'l_partkey':       [1, None, 2, 3, 4],
 'l_suppkey':       [1, 1, None, 1, 1],
 'l_linenumber':    [1, 1, 2, 1, 2],
 'l_quantity':      [5.0, None, 7.0, 1e308, 9.0],
 'l_extendedprice': [100.0, 200.0, None, 1e308, 300.0],
 'l_discount':      [0.05, 0.06, 0.07, None, 0.08],
 'l_tax':           [0.01, 0.02, 0.03, 0.04, None],
 'l_returnflag':    [None, 'A', 'N', 'R', 'A'],
 'l_linestatus':    ['O', None, 'F', 'O', 'F'],
 'l_shipdate':      [t0, t0, None, t0, t0],
}
ex = pa.table(lrows, schema=pa.schema([(f.name, f.type) for f in li.schema]))
pq.write_table(pa.concat_tables([li, ex.cast(li.schema)]), f'{dst}/lineitem.parquet')

od = pq.read_table(f'{src}/orders.parquet')
omx = max(od.column('o_orderkey').to_pylist())
orows = {
 'o_orderkey':      [mx+1, mx+2, omx+10],
 'o_custkey':       [None, 3, 5],
 'o_orderstatus':   ['O', None, 'F'],
 'o_totalprice':    [1234.5, None, 1e308],
 'o_orderdate':     [None, dt.datetime(1995,3,1), dt.datetime(1995,3,2)],
 'o_orderpriority': ['1-URGENT', '2-HIGH', None],
}
oex = pa.table(orows, schema=pa.schema([(f.name, f.type) for f in od.schema]))
pq.write_table(pa.concat_tables([od, oex.cast(od.schema)]), f'{dst}/orders.parquet')

cu = pq.read_table(f'{src}/customer.parquet')
cmx = max(cu.column('c_custkey').to_pylist())
crows = {f.name: [] for f in cu.schema}
names = set(crows)
base = {'c_custkey': [cmx+1, cmx+2], 'c_name': [None, 'Customer#X'],
        'c_nationkey': [1, None], 'c_mktsegment': ['BUILDING', None]}
for f in cu.schema:
    if f.name in base: crows[f.name] = base[f.name]
    else: crows[f.name] = [None, None]
cex = pa.table(crows, schema=pa.schema([(f.name, f.type) for f in cu.schema]))
pq.write_table(pa.concat_tables([cu, cex.cast(cu.schema)]), f'{dst}/customer.parquet')
print('poison004 built:', sorted(os.listdir(dst)))

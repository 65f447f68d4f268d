"""Poisoned-corpus builder (driver-side tooling, NOT shipped library code).
Appends adversarial rows to a copy of sf0.001 for the parity sweep —
see PLANS.md round-15 cont. 4/5 and tools/ORACLES.md.
Usage: python3 tools/build_poison001.py [destDir]
"""
import pyarrow as pa, pyarrow.parquet as pq, shutil, os
src=(__import__('sys').argv[2] if len(__import__('sys').argv)>2 else '/root/testdata/sf0.001'); dst=(__import__('sys').argv[1] if len(__import__('sys').argv)>1 else '/tmp/poison001')
os.makedirs(dst, exist_ok=True)
for t in ['region','nation','customer','supplier','part','orders','lineitem','events']:
    shutil.copy(f'{src}/{t}.parquet', f'{dst}/{t}.parquet')

d = pq.read_table(f'{src}/documents.parquet')
maxid = max(d.column('doc_id').to_pylist())
texts = [
    (None, "en", "src1"),                     # null text
    ("", "en", "src2"),                       # empty
    ("   \t  \n ", "en", "src3"),             # whitespace only
    ("a(b)*c+d?e|f[g]h{2}\\Q\\E$1 ${x} \\n", "en", "src4"),  # regex metas
    ("café café 中文文本 \U0001F600 mixed", "en", "src5"),
    ("ctrl\u0000\u0001 andbytes", "en", "src6"),
    ("tok " * 1500, "en", "src7"),           # 200k chars, repetitive
    ("z" * 600, "en", "src8"),               # one giant word
    ('quotes "double" \'single\' <tag> &amp; </s> <|endoftext|>', "en", "src9"),
    ("normal text row for control", None, "src10"),   # null lang
    ("another normal row", "en", None),               # null source
]
rows = {
 'doc_id': [maxid+1+i for i in range(len(texts))],
 'text': [t[0] for t in texts],
 'lang': [t[1] for t in texts],
 'source': [t[2] for t in texts],
 'n_chars': [len(t[0]) if t[0] is not None else None for t in texts],
}
extra = pa.table(rows, schema=pa.schema([(f.name, f.type) for f in d.schema]))
pq.write_table(pa.concat_tables([d, extra.cast(d.schema)]), f'{dst}/documents.parquet')

e = pq.read_table(f'{src}/embeddings.parquet')
dim = len(e.column('embedding')[0])
maxv = max(e.column('vec_id').to_pylist())
erows = {
 'vec_id': [maxv+1, maxv+2, maxv+3],
 'embedding': [None, [0.0]*dim, [1e30]*dim],
 'label': [None, 0, 1],
}
ex = pa.table(erows, schema=pa.schema([(f.name, f.type) for f in e.schema]))
pq.write_table(pa.concat_tables([e, ex.cast(e.schema)]), f'{dst}/embeddings.parquet')
print('poisoned dir built:', sorted(os.listdir(dst)))

"""Poisoned-corpus builder (driver-side tooling, NOT shipped library code).
Appends adversarial rows to a copy of sf0.001 for the parity sweep —
see PLANS.md round-15 cont. 4/5 and tools/ORACLES.md.
Usage: python3 tools/build_poison002.py [destDir]
"""
import pyarrow as pa, pyarrow.parquet as pq, shutil, os, unicodedata
src=(__import__('sys').argv[2] if len(__import__('sys').argv)>2 else '/root/testdata/sf0.001'); dst=(__import__('sys').argv[1] if len(__import__('sys').argv)>1 else '/tmp/poison002')
os.makedirs(dst, exist_ok=True)
for t in ['region','nation','customer','supplier','part','orders','lineitem','events','embeddings']:
    shutil.copy(f'{src}/{t}.parquet', f'{dst}/{t}.parquet')
d = pq.read_table(f'{src}/documents.parquet')
maxid = max(d.column('doc_id').to_pylist())
base_cn = "中文 文本 处理 系统 在 大规模 语料 上 运行 良好 并且 去重 模块 工作 正常 这是 一个 较长 的 测试 文档 用于 产生 足够 的 词组"
base_fr = "le café naïve résumé était déjà prêt à côté de la fenêtre où les élèves étudiaient leurs leçons préférées chaque matin très tôt"
texts = [
    # near-dup CJK pair (one token changed)
    (base_cn, "zh", "src1"),
    (base_cn.replace("正常", "稳定"), "zh", "src1"),
    # near-dup accented pair, one NFC one NFD (byte-different, same graphemes)
    (base_fr, "fr", "src2"),
    (unicodedata.normalize('NFD', base_fr), "fr", "src2"),
    # emoji-separated near-dups (emoji act as separators in both tokenizers)
    ("alpha 😀 beta gamma delta epsilon zeta eta theta iota kappa " * 3, "en", "src3"),
    ("alpha 🎉 beta gamma delta epsilon zeta eta theta iota kappa " * 3, "en", "src3"),
    # mixed-script near-dups sharing most shingles
    ("das über große straße müller test eins zwei drei vier fünf sechs sieben acht neun zehn elf zwölf", "de", "src4"),
    ("das über große straße müller test eins zwei drei vier fünf sechs sieben acht neun zehn elf dreizehn", "de", "src4"),
]
rows = {
 'doc_id': [maxid+1+i for i in range(len(texts))],
 'text': [t[0] for t in texts],
 'lang': [t[1] for t in texts],
 'source': [t[2] for t in texts],
 'n_chars': [len(t[0]) for t in texts],
}
extra = pa.table(rows, schema=pa.schema([(f.name, f.type) for f in d.schema]))
pq.write_table(pa.concat_tables([d, extra.cast(d.schema)]), f'{dst}/documents.parquet')
print('poison002 built:', sorted(os.listdir(dst)))

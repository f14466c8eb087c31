#!/usr/bin/env python3
"""Per-family decade table: sf1 head vs sf10 full-suite recordings.

Usage: tools/family_table.py BENCH_sf1.json BENCH_sf10.json

Families mirror BASELINE.md's round-12 grouping. Embeddings do NOT
replicate at sf10 (GenSf1's rotation ceiling — the vec ladder in
BENCH_vec*_r12.json is ANN's real decade evidence), so the ANN family
row is labeled "corpus unchanged" rather than presented as a decade.
"""
import json, sys, statistics

ANN = {60,61,62,63,64,65,66,67,103,110,119,123,126,133,134,136,139,142,143,
       146,148,149,157,158,160,161,162,163,164,165,166,168,169}
TEXT = {40,41,42,43,44,45,46,47,48,49,50,51,52,53,54,55,56,57,90,95,97,98,99,
        102,104,105,106,107,111,112,118,128,129,131,132,144,147,150,152,153,156}
MULTI = {70,71,72,73}
def fam(q):
    n = int(q[1:].split('_')[0])
    if n <= 39 or n in (58, 59): return 'relational (scan/join/agg/window/setop)'
    if n in MULTI: return 'multimodal plumbing'
    if n in ANN: return 'embeddings / ANN / recall (corpus unchanged at sf10)'
    if n in TEXT: return 'text analysis + dedup/decon'
    return 'pipeline / sampling / sketch / dedup-compose'

def main(f1, f10):
    sf1 = json.load(open(f1))['queries']
    sf10 = json.load(open(f10))['queries']
    common = sorted(set(sf1) & set(sf10))
    agg = {}
    for q in common:
        a, b, n, rs = agg.setdefault(fam(q), [0.0, 0.0, 0, []])
        agg[fam(q)] = [a + sf1[q], b + sf10[q], n + 1, rs + [sf10[q]/sf1[q]]]
    for f, (a, b, n, rs) in sorted(agg.items()):
        print(f"| {f} | {n} | {a:.1f} | {b:.1f} | {b/a:.2f}x | {statistics.median(rs):.2f}x |")
    t1, t10 = sum(sf1[q] for q in common), sum(sf10[q] for q in common)
    med = statistics.median(sf10[q]/sf1[q] for q in common)
    print(f"| ALL (common) | {len(common)} | {t1:.1f} | {t10:.1f} | {t10/t1:.2f}x | {med:.2f}x |")
    worst = sorted(((sf10[q]/sf1[q], q) for q in common), reverse=True)[:8]
    print("worst:", ", ".join(f"{q} {r:.1f}x ({sf10[q]:.1f}s)" for r, q in worst))

if __name__ == '__main__':
    main(sys.argv[1], sys.argv[2])

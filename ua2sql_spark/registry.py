"""Query registry: the operator inventory of SURVEY.md §2 as code.

Every implemented operator registers a named query — a callable
``(spark, sf_dir) -> DataFrame`` — and, when SQL-expressible, a matching
ANSI-SQL oracle string that DuckDB runs over the same parquet tables.
The driver's correctness gate compares the two (row count + schema +
order-insensitive value hash), so:

* every computed column is aliased identically in both,
* double-typed aggregates are rounded (ROUND(x, 4)) in both so IEEE
  summation order can't flip the hash,
* ranking queries use total tie-break orders so row_number is
  deterministic.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB; None -> rows-only check
    doc: str = ""


_REGISTRY: dict[str, QuerySpec] = {}

# The driver's correctness gate checks the FIRST 50 registry entries in
# iteration order (rows + schema + value hash vs DuckDB at sf0.01).
# This explicit window guarantees every SURVEY §2 / §2.11 family lands a
# representative inside the hard signal: relational core, every join
# flavor, aggregate/window/sort families, JSON + array functions,
# temporal joins, event analytics, streaming-window batch mirror, dedup
# (exact / LSH pairs / survivor / transitive clusters / fast family /
# incremental), similarity (brute-force / sign-LSH / IVF / kNN-over-IVF
# / recall contract), text analysis, multimodal, the Pandas-UDF
# surface, advanced SQL (pivot / correlated subqueries), TPC-H
# archetypes, and the training-data pipeline ops (packing, global
# shuffle, PII scrub, token-budget sampling, quantization).
#
# Round-6 rotation (VERDICT r5 next-round #4): bring the
# never-driver-checked r5 families into the window — theta-sketch set
# ops (q139), CDC chunking (x142), NFC normalization (x143), recursive
# CTE (q147), SQL pipe syntax (q150; q152 parameterized-SQL stays
# local, same SQL-surface family), polymorphic UDTF (x149),
# applyInArrow (x136), bloom semi-join reduction (q135), record
# linkage (x146), epoch up-sampling (x150), tokenizer fertility
# (x151), Welch t-test (q145; q146 histogram stays local, same stats
# family), temperature resampling (x131). Out, each leaving an
# in-window family representative (rotation #1): q07/q08 (semi/anti join shapes kept
# by q135's bloom semi-join and x117's plan-pinned anti-join + q126's
# decorrelated anti), q20 (agg family keeps q13/q16/q19/q114), q26
# (sorts keep q22/q25), q28 (JSON kept by q120 variant), x43/x96 (md5
# oracle tiers — the production xxhash64 twins x101/x115 stay), x46/
# x100 (similarity keeps x130/x71 + both recall contracts), x77
# (Python surface keeps x127; x136/x149 add the Arrow/UDTF APIs), q95
# (archetypes keep q86/q126), x104 (order-by-hash sampling machinery
# kept by x131/x150; x97 packing stays), x148 (driver-green r5; the
# selection family keeps x111 + gains x131). Late-r6 swaps for the
# operators built THIS round: x101 -> x154 (the xxhash64 fast-dedup
# family keeps x115 clusters + x117 incremental in window; PQ-ADC
# retrieval is a new compression family with a recall gate), x141 ->
# x153 (sub-document dedup keeps x142 CDC in window; JPEG EXIF
# extraction is a new multimodal-metadata family, round-6 task #8).
# All rotated-out rows remain local-oracle green in
# tests/test_oracle.py.
#
# Late-r6 rotation #2, for the analytics batch built after the first
# rotation (x155-x173, q159, q168 had never seen a driver check):
# x41 -> x158 (exact dedup keeps x115/x117/x142 in window; BM25 is a
# new lexical-retrieval family), q34 -> x170 (array higher-order
# functions are exercised harder by the positional posting lists'
# collect/sort/join of struct arrays), q22 -> q159 (ranking stays via
# q25 top-k; sliding distinct actives is a new windowed-distinct
# family), q13 -> x157 (group-by+HAVING kept by q16/q19/q114/q123/
# q139/q140; the declarative data-quality gate is a new audit family),
# x112 -> x173 (similarity keeps x130/x71 + three recall contracts;
# two-sample KS over binned ECDFs is a new distribution-distance
# family), q86 -> q168 (TPC-H archetypes keep q126; growth-accounting
# DAU decomposition is a new product-analytics family).
#
# Late-r6 rotation #3, for the final r6 batch (x174-x180 did not exist
# at rotation #2). In, all never-driver-checked new families; out, rows
# driver-green in r5 (or earlier) whose family keeps an in-window
# representative: q04 -> x176 (inner equi-join exercised by every
# remaining join row; degree-oriented triangle counting is a new graph-
# cohesion family), q19 -> x175 (max_by stays driver-proven r1-r5; the
# deequ-style column profiler is a new dataset-audit family and its
# fan-out row carries five exact COUNT(DISTINCT)s), q40 -> x177
# (windowed events keep q35/q144/q159 in window; rolling-median/MAD
# anomaly detection is a new robust-monitoring family), x117 -> x179
# (incremental dedup green r5, family keeps x115/x142/x158; the PPJoin
# prefix-filter join adds an EXACT-similarity recall-1.0 contract the
# LSH tier cannot express), x121 -> x178 (IVF recall stays gated by
# x133/x154 quantized contracts; Lloyd k-means is the clustering/
# iterative side of the same family), x53 -> x180 (fake-decode seam
# green r1-r5 and strictly dominated by the REAL WAV encode->decode
# round trip through the same mapInPandas plumbing), x111 -> x174
# (PII scrub green r5, selection family keeps x131/x150; SemDeDup is
# the semantic-dedup family's only row), x48 -> x181 (token stats
# driver-green r1-r5, text family keeps x151 fertility in window;
# the LSH recall contract makes dedup quality a driver-gated bit —
# banded-MinHash recall measured against the exact x179 tier),
# q16 -> x182 (rollup driver-green r1-r5, agg family keeps q114/
# q123/q139/q140/x157/q145 in window; Cohen's-kappa annotator
# agreement is a new label-quality family). Rotation #4 (the final
# r6 batch): q25 -> x183 (top-k green r1-r5 with the
# WindowGroupLimit plan-pin enforced locally, windowed family keeps
# q159; bot-cadence is a new traffic-hygiene family), x130 -> x184
# (RRF fusion green r5, similarity keeps x71/x133/x154/x173/x178/
# x174; scan-shaped RFM is a new product-analytics feature-build
# family), x127 -> x185 (inference seam green r5, the Python/Arrow
# surface keeps x136/x149/x180 in window; the CMS contract
# completes the mergeable-sketch suite). All
# rotated-out rows remain local-oracle green in tests/test_oracle.py.
#
# Round-5 rotation (VERDICT r4 next-round #1): rows whose family keeps
# another in-window representative moved below the fold (q02/q03 —
# filter+CASE surface proven by q01; q06 → q116 full outer carries both
# null sides; q11 set ops; q15 → q114 approx-sketch contract; q24
# framed aggs — W family keeps rank/lag/top-k; q27 → q26 sort rep; q36
# range — temporal rep is q35 as-of; q39 — event rep is q37/q40; x50 —
# text rep is x48; x52 → x53 is the stronger multimodal row) to make
# room for the round-3/4 operators that had never seen a driver check.
# Late-r5 swaps for the operators built THIS round: q14 → q123 (HLL
# union subsumes the exact distinct), x73 → x127 (scalar pandas_udf →
# the mapInPandas inference seam; x77 keeps the grouped-map API in
# window), q79 → q126 (Q7's two-nation shape is covered stronger by
# q95/Q8; Q22 adds scalar-subquery + anti-join decorrelation), x45 →
# x130 (hybrid RRF contains the brute-force cosine inside its top-N),
# q54 → x124 (pivot stays local-proven; z-order is a new family with
# no other driver row); q56 → x138 (correlated-EXISTS decorrelation is
# driver-proven by q86's stronger EXISTS+NOT-EXISTS row; PageRank is a
# new iterative-dataflow family), q23 → x133 (lag/lead stays
# local-proven while W keeps rank/top-k/order-limit in window; the
# int8-quantized retrieval path gains its recall gate). Everything
# below the fold stays covered by the local oracle suite
# (tests/test_oracle.py runs ALL registered queries) and the alt-SF
# sweep. Additional late-r5 swaps: x113 -> x148 (the bucketed
# prefix-sum machinery stays driver-checked via x104; DSIR importance
# selection is a new family), q37 -> q144 (event analytics keeps
# q40 windows + q35 as-of in window; time-series gap-fill/LOCF is a
# new family); q18 -> q140 (exact percentiles are
# recomputed INSIDE q114's contract oracle; the bitmap exact-distinct
# tier is a new mergeable-exactness family), x81 -> x141 (survivor
# selection is semantically inside x96's min-id clusters; span-level
# dedup is a new sub-document family).
# Round-7 rotation #5 (VERDICT r6 next-round #1): bring the ~20 rows
# that had NEVER held a driver check in any round into the window —
# the late-r6 analytics batch (x155/x156/x160-x167/x169/x171/x172) and
# the long-tail SQL-surface/stats rows (q119/q137/q146/q151/q152) —
# plus x186_scd2_history, the first driver row for the X12
# versioned-table family (VERDICT r6 next-round #2). Out, every one
# driver-green in r6 and leaving a family representative in-window:
# x176 (graph cohesion kept by x138 PageRank), q05 (broadcast-join
# plan-pin stays local; joins keep q09/q116/q135/x146), q123 (sketch
# suite keeps q139 theta + x185 CMS + q114 GK), x182 (stats keep q145
# Welch + incoming q137/x173), x175 (audit keeps x157), q147+q150
# (SQL surface gains q151 collation + q152 parameterized), x170
# (lexical retrieval keeps x158 BM25 + incoming x171 phrase match),
# x142 (dedup keeps x115/x179/x181 + incoming x164), x153 (multimodal
# keeps x180 real-WAV), x143 (string-function family gains x160 URL
# canonicalization), x154 (quantized-retrieval contracts keep x133),
# x184 (product analytics keeps q168 + incoming x165/x166), x71
# (similarity keeps x133/x174 + incoming x169 JL), x151 (text keeps
# x158), x178 (clustering family keeps x174 SemDeDup's centroid
# pipeline), x136 (Python surface keeps x149 UDTF + x180 mapInPandas),
# x97 (pipeline keeps x150/x131 + incoming x156/x162 samplers), x177
# (windowed anomaly family keeps q159/q144 + incoming x167 PSI).
# All rotated-out rows remain local-oracle green in
# tests/test_oracle.py and the alt-SF sweep.
#
# Round-8 rotation #6 (VERDICT r7 next-round #2): start retiring the 49
# rows that have NEVER held a driver check — 18 in, prioritizing the
# oldest pipeline ops over the TPC-H archetypes (whose shapes stay
# driver-pinned by q01/q09/q116/q126/q135): x49 quality score, x68/x69
# near-dup variants, x70 hash split, x84 BPE token count, x88/x89
# centroid/kNN, x90 stratified sample, x91 distinctive terms, x98
# corpus clean, x99 domain mix, x106 contamination, x107 heavy
# hitters, x108 vocab OOV, x109 train shuffle, x110 dup-ngram
# fraction, x113 token-budget sample, x134 BPE merge pairs. x125
# unigram-logprob is deliberately NOT rotated in: its hashed columns
# derive from ROUND(LN(p),4) — the same transcendental hazard that
# made x155 the r7 red row — so it stays local-only until re-keyed.
# Out, all driver-green in r7 and each leaving an in-window family
# representative: x146 (joins keep q09/q116/q135/q126/q35), q119 (agg
# keeps q114/q139/q140/x157/q145), q137+q146 (stats keep q145 Welch +
# x173 KS), q151 (SQL surface keeps q152 + q120), x164 (dedup keeps
# x115/x179/x181 + incoming x68/x69/x110/x106), x169 (embedding math
# keeps x133/x174 + incoming x88/x89), x171/x160/x163/x161/x172 (text
# keeps x158 BM25 + incoming x49/x84/x91/x98/x108/x134), x165/x166/
# q168 (events keep q159/q144/x167/x183), x150/x131/x156 (sampling
# keeps x162 + incoming x90/x109/x113). x155 stays IN per VERDICT r7
# next-round #1, now hashed transcendental-free. Late-r8 swap:
# q152 -> x187 (parameterized SQL driver-green r7, SQL surface fully
# driver-proven by q147/q150/q151/q152 across r6-r7; EXIF-orientation-
# aware thumbnailing is the r6 #7 / r7 #7 carry item and gives the
# orient-before-downscale geometry its driver gate), x183 -> x188
# (bot-cadence driver-green r7, events keep q159/q144/q35; the
# Gopher-style repetition filters are a new quality-gate family built
# this round), x167 -> x189 (PSI drift driver-green r7; word-rarity is
# the unigram-LM family's transcendental-free driver gate — x125's
# log-prob twin stays local per the x155 determinism rule),
# q140 -> q153 (bitmap exact-distinct driver-green r7, sketch suite
# keeps q139 theta + q114 GK + x185 CMS; SQL/PSM scripting is a new
# procedural-SQL family built this round), q144 -> q154 (gap-fill
# driver-green r7, events keep q159/q35; catalog SQL UDFs are the
# warehouse-migration scalar surface, inlined at analysis time), x157 -> x190
# (declarative quality constraints driver-green r7, the audit shape
# stays via x188's integer-gated gopher_pass; x190 drives the round's
# new row-level CoW DELETE + its change feed through the hard gate,
# completing X12's driver coverage alongside x186).
# Round-9 rotation #7 (VERDICT r8 #3): retire 16 of the 31 rows that
# have never held a driver check, plus gate the round's new x191 BPE
# trainer same-round. In: x122 skew join (AQE skew handling under the
# hard gate), x132 embedding outliers, x51 shingle fingerprint (now
# let-bound, tripwire-clean), x83 frame sample, the remaining
# Python-surface rows x72/x74/x75/x76 (doc chunking UDTF shape, pandas
# grouped-agg MAD, mapInArrow bytestats, UDTF sentences), q118 NTILE
# deciles, q66 salted agg, x128 length-bucket batching, x129 domain
# cap, q68 explicit GROUPING SETS, q55 unpivot, q63 posexplode, q67
# to_json, and x191 (first driver row, built this round). Out, every
# one driver-green in r8 and each leaving an in-window family
# representative: q120 (JSON parse driver-proven q28/q29 r1-r5; q67
# carries serialization), q139 (sketches keep q114 GK + x185 CMS),
# x115 (dedup keeps x179/x181/x110/x106 + incoming x51), x68/x69
# (near-dup keeps x174/x179/x181/x110), x88/x89 (embedding math keeps
# x133 + incoming x132), x49 (text quality keeps x188/x189/x98), x84
# (BPE keeps x134 + incoming x191 trainer), x91 (lexical stats keep
# x158), x108 (vocab keeps x134/x191), x180 (multimodal keeps x187 +
# incoming x83), x107 (heavy hitters keep x185's CMS contract),
# x70/x90/x99/x109 (pipeline sampling/mix keeps x113/x162 + incoming
# x128/x129). x125 unigram-logprob REMAINS local-only: its hashed
# columns derive from ROUND(LN(p),4) — multi-op transcendental chains
# are exactly what made x155 red in r7/r8 (x189 carries the unigram-LM
# family's driver gate with integer-exact rarity instead). All
# rotated-out rows remain local-oracle green in tests/test_oracle.py.
# Round-10 rotation #8 (VERDICT r9 #2/#4): gate EVERY remaining
# never-driver-checked row in one window — the 5 late-r9 additions
# (x193 group-coherent split, q155 LATERAL top-k, q156 GROUP BY ALL +
# OFFSET, q157 INTERSECT/EXCEPT ALL, q158 value-RANGE frame), the full
# 14-row TPC-H/SQL tail (q57-q94), and this round's new x194 persisted
# LSH-index probe (VERDICT r9 #6, built-and-gated same round). After a
# green r10, never-driver-checked == {x125} exactly (its ROUND(LN) hash
# columns are documented local-only per the x155 determinism rule;
# x189/x191 carry the unigram-LM family's driver gate). Out, every one
# driver-green in r9 and each leaving an in-window family member:
# x122 (joins keep q09/q116/q135 + the incoming TPC-H join shapes),
# q66/q68 (aggs keep q01/q114/x185; grouping keeps incoming q156 — q68's
# explicit GROUPING SETS was driver-proven r9), q118 (windows keep q159
# + incoming q158/q60), q55/q63/q67 (SQL surface keeps q153/q154 +
# incoming q155/q156/q157), x51 (dedup keeps x179/x181/x110/x106 +
# incoming x194), x132 (embedding math keeps x133/x155), x72/x74/x75/
# x76/x83 (Python-execution surface keeps x149 UDTF + x187 mapInPandas;
# every API in this family is driver-proven r6-r9), x191/x192 (BPE
# keeps x134; trainer+encoder driver-proven r9), x162/x128/x129
# (sampling/batching keeps x113 + incoming x193's group-coherent
# split), x174 (near-dup keeps x179/x181/x194). All rotated-out rows
# remain local-oracle green in tests/test_oracle.py.
#
# Round-11 rotation #9 (VERDICT r10 #1): the never-checked queue is
# empty ({x125} by design), so STALENESS is now the rotation driver —
# the driver environment has twice disagreed with a green local emu
# (x155, r7 AND r8), so rows whose last driver check is old are the
# risk. Policy (enforced by tests/test_oracle.py::
# test_driver_freshness_max_staleness, computed from the on-disk
# CORRECTNESS history): rotate oldest-first, priority to rows whose
# shared substrate changed recently. In (24): the whole minhash/dedup
# family over operators/dedup.py + functions/text.py (edited r9-r11) —
# x41/x42/x43/x44/x81/x96/x101/x117 — the full r2-vintage cohort
# q10/q12/q17/q21/q29/q30/q31/q32/q33/q38/q82/x47, the r4-vintage
# relational pair q02/q03, and this round's new x198 (IVF drift/health
# report) + x199 (checksum-validated structured PII scrub), gated
# same-round. Out (24), every one driver-green in r10 and each leaving
# an in-window family member: the 14-row TPC-H/SQL tail q57-q94
# (first-gated r10; joins keep q09/q116/q135 + incoming q10/q02/q03,
# windows keep q158 + incoming q82, strings/dates keep incoming
# q30/q31/q32, EXISTS/anti shapes keep q135), x186 (X12 keeps x190),
# x113 (sampling keeps x193), q126 (archetypes keep q135 + the
# r10-green tail below the fold), x149 (Python surface keeps x187
# mapInPandas; every API in the family driver-proven r6-r10), x185
# (sketches keep q114 GK), x158 (retrieval contracts keep x133/x155),
# x134 (BPE driver-proven r9-r10), x173 (stats keep q114 + incoming
# q21 variance), q159 (events keep q35/q38/q82), x181 (the banded-LSH
# recall geometry is measured stronger by x194's index-probe recall
# row; pair listing keeps incoming x43 + x179).
#
# Late-r11 swaps for the operators built in the round's second half,
# each swap-out driver-green in r10 and leaving a family member in
# window: q153 -> x201 (SQL surface keeps q154/q155; scripting was
# first-gated r10 — RESTORE is X12's never-gated recovery primitive),
# q157 -> x203 (set ops keep q12, itself in this window; Mann-Whitney
# U adds the rank-based tier to the stats family beside q114/q21),
# x197 -> x202 (similarity keeps x133/x155/x47/x198; cross-table
# reconciliation is a NEW migration-validation family with no other
# driver row), x196 -> x204 (the bloom contract was first-gated r10
# and the exact-dedup family keeps x41/x42/x101/x117; the LSH index
# health report is the maintenance number compact_lsh_index — built
# this round — needs, gated from birth like x198), x187 -> x205
# (EXIF thumbnail geometry driver-green r10; x205 carries the same
# mapInPandas media seam AND strengthens it — a lossless PNG
# encode->decode round trip pinned pixel-exact through the dHash,
# plus the banded-Hamming near-dup join bridging X6 into X2),
# q154 -> x206 (catalog SQL UDFs driver-green r7 AND r10, surface
# keeps q155; incremental reconciliation completes the x202 audit
# lifecycle — churn keys from the change feed, semi-joined slices,
# keyed diff — gated from birth), x190 -> x207 (CoW delete+feed
# driver-green r8 AND r10, X12 keeps x200/x201 in window; Spearman
# completes the rank-statistics tier beside x203's U — Pearson over
# doubled tie-averaged ranks, every hashed moment integral).
# Round-12 rotation #10 (VERDICT r11 #1, executed per the written
# guidance below and in PLANS.md): the staleness test (MAX_STALENESS=7,
# tests/test_oracle.py) starts failing in round 13 for any row still
# last-green r4, so the FULL r4 cohort of 18 rotates in
# (q06/q11/q14/q15/q18/q23/q24/q27/q36/q37/q39/q54/q56/q79/x45/x50/
# x52/x73) plus 6 of the r5 cohort chosen by recently-edited substrate
# (x53 media seam + x111 PII — media.py/corpus_ops.py edited r11;
# x100/x112/x121 — similarity/ivf edited r11; x141 span dedup —
# dedup substrate edited r9-r11), plus the round's two first-time
# gates: x208 (repair_from_reference, VERDICT r11 #5 — the reconcile
# family's write half) and x125 (re-keyed to integer-exact whole-bit
# surprisal, VERDICT r11 #6 — retiring the last local-only exception),
# plus two operators BUILT this round and gated from birth: x209
# Kendall tau-b (completing the rank-statistics tier; slot from x205,
# r11-green, media keeps x52/x53/x73) and x210 Benford first-digit
# audit (the dataset-audit family's numeric-forensics member; slot
# from x188, r11-green, text keeps x50/x125) and x211 chi-squared
# independence (categorical-association stats; slot from x189,
# r11-green — x188/x189 both sit below the fold freshly proven).
# Out (26 + the x205/x188 late swaps), every one driver-green in r11
# and each leaving an
# in-window family member: q01/q02/q03 (relational keeps q79's
# projection+filter archetype, q27 sorts, q56), q09 theta (non-equi
# keeps q36 range join), q10 cross (joins keep q06/q36/q56), q116
# full-outer (x202's reconcile IS a full-outer diff), q135 bloom semi
# (EXISTS shape keeps q56), q12 (set ops keep incoming q11), q17 cube
# (grouping keeps q54 pivot), q21/q114 (stats/sketches keep
# x203/x207/q18/q15), q30/q31/q33 (scalars keep q29 JSON + q32 dates;
# strings exercised by x195 edit-distance + x50 langid), q38/q82/q158
# (windows/events keep q35 asof + incoming q23/q24/q37/q39),
# x41/x42/x101/x117 (exact/fast dedup keeps incoming x141 + x204's
# index maintenance), x43/x44/x81/x96 (minhash tiers keep x179/x194
# over the same substrate), x199 (PII keeps incoming x111). All
# rotated-out rows remain local-oracle green in tests/test_oracle.py.
# Round-13 rotation #11 (VERDICT r12 #1, executed per the written
# guidance below and in PLANS.md): the staleness test (MAX_STALENESS=7,
# tests/test_oracle.py) starts failing in round 14 for any row still
# last-green r5, so the FULL r5 cohort of 22 rotates in
# (q04/q07/q08/q13/q16/q19/q20/q22/q25/q26/q28/q34/q40/q86/q95/
# x46/x48/x77/x104/x127/x130/x148) plus 2 of the 19-row r6 cohort,
# oldest-first by family risk (q05 star-broadcast — the plan-pinned
# BHJ archetype; x71 IVF ANN — the similarity family's cell-join
# spine, substrate edited r11), plus the round's first-time gate: x212
# snapshot_layout_health (VERDICT r12 #2 — the measure-first
# maintenance trio's last ungated member, windowed from birth like
# x198/x204 before it). x204 STAYS in window because its hashed frame
# changed this round (compaction-idempotence columns, VERDICT r12 #7).
# Out (25), every one driver-green in r12 and each leaving an
# in-window family member: q06 left-outer (joins keep incoming
# q04/q05/q07/q08; the full-outer diff shape stays via x202), q27
# (sorts keep incoming q26), q36 range (temporal keeps q35 asof), q56
# (EXISTS/NOT-EXISTS archetype kept stronger by incoming q86), q79
# (archetypes keep q86/q95), q14 (distincts keep q15 approx + incoming
# q13/q16/q19/q20 aggs), q54 pivot (grouping keeps incoming q16
# rollup), q29 (JSON keeps incoming q28; q32 dates stays), q23/q24
# (windows keep incoming q22/q25), q37/q39 (events keep incoming q40
# + q35), x45 (similarity keeps incoming x130 — brute-force cosine
# lives inside its top-N — and x46), x100 (IVF keeps incoming x71 +
# kept x198), x112 (quantization keeps x133's recall contract), x121
# (IVF contracts keep x133 + x198), x141 span dedup (dedup keeps
# x179/x194/x204), x195 fuzzy join (exact-similarity joins keep x179),
# x203/x207 (rank stats keep x209 Kendall + x211 chi²), x206/x208
# (reconcile keeps x202; the write half's idempotence harness is
# driver-proven r12 from birth), x125 (text keeps incoming x48 + kept
# x50), x73 (Python surface keeps incoming x77 applyInPandas + x127
# mapInPandas + kept x53), x47 (array higher-order math kept by
# incoming q34 + the embedding rows). All rotated-out rows remain
# local-oracle green in tests/test_oracle.py.
# Late-r13 swaps for the operators BUILT this round, gated from birth
# (the x198/x204/x209 discipline), each swap-out driver-green in r12
# and leaving an in-window family member: x52 -> x213 Mann-Kendall
# trend + Theil-Sen slope (the nonparametric tier's TREND member —
# x203 U / x207 rho / x209 tau / x211 chi² cover comparison,
# correlation and association; multimodal keeps x53's decode seam plus
# the x127/x77 Python surface), x193 -> x214 split-leakage audit (the
# dedup-aware eval-contamination check: exact-dup pairs straddling the
# train/val/test hash split, pair-free per-fingerprint arithmetic; the
# sampling/split family keeps x104 + x148 in window and GAINS the
# audit that makes x70/x193-style splits trustworthy), x50 -> x215
# OHLC time-bucket downsampling (the hypertable continuous-aggregate
# archetype with total-order open/close picks; text keeps x48 in
# window plus x125/x188/x189 r11/r12-green below the fold), x211 ->
# x216 weekly retention-cohort matrix (the full cohort triangle behind
# q39's readout, integer-ppm shares; the stats family keeps x209
# Kendall + x213 Mann-Kendall in window, x211 chi² r12-green), and
# x201 -> x217 incrementally-maintained join view (operators/
# ivm_join.py: V = A ⋈ B kept current from both bases' change feeds,
# recompute-equality pinned 0 in the hashed frame; RESTORE is
# r12-green and X12 keeps x200 drift + x212 layout + the view row).
# Round-14 rotation #12 (executed per rotation #11's written NEXT
# guidance): STALENESS is the driver — the 17-row r6 cohort (fails the
# MAX_STALENESS=7 test entering r15 unless green in r14) rotates in
# wholesale (q123/q147/q150/x136/x142/x143/x151/x153/x154/x170/x175/
# x176/x177/x178/x182/x184/x97), and the FULL 24-row r7 cohort comes
# with it (q119/q137/q140/q144/q146/q151/q152/q168/x131/x146/x150/
# x156/x157/x160/x161/x163/x164/x165/x166/x167/x169/x171/x172/x183)
# — taking all of r7 now, one round early, frees r15/r16 slots to
# pre-pull the 32-row r10 cohort that would otherwise overflow r18.
# Plus the round's two first-time gates, windowed from birth (the
# x198/x204/x209 discipline): x218 CIDR longest-prefix-match
# enrichment (INET parity with ua2sql.py:51,68 — grid-bucketed
# broadcast equi-joins, never a theta join) and x219 exact weighted
# median (cell-preaggregated selection, integer threshold
# arithmetic).
# Kept (7): q95 market-share (the multi-way join archetype — the join
# family's in-window rep while q04-q08/q86 rotate below the fold
# r13-green), q35 as-of (temporal join), q11 UNION ALL (the set-op
# family's only driver row), x202 reconcile (family rep; x206/x208
# r12-green), x111 PII scrub (family's in-window rep; x199 r11-green),
# x212 snapshot layout health (X12 + the measure-first maintenance
# trio's rep while x198/x204 rotate out r13-green), x217 IVM join view
# (X12's churn-maintenance rep, r13-green from birth and re-proven
# after this round's ADVICE fixes: fail-closed cursor read +
# value-empty-feed cursor advance).
# Out (43), every one driver-green in r13, family accounting: joins
# keep q95/q35 (q04/q05/q07/q08/q86 out); aggs keep incoming q119/
# q137/q146 (q13/q19/q20 out; grouping-sets family q16 out — below
# fold r13-green, q17/q68 cover below fold); sketches keep incoming
# q123 HLL + q140 bitmap (q15 out; q18 percentiles out — selection
# family keeps incoming q146 histogram + x219 weighted median); scalar
# funcs keep incoming x143 unicode + x160 url + q144 dates (q28/q32/
# q34 out); windows keep incoming x177 MAD frames + q168 lag + q144
# LOCF (q22/q25/q26 out); events keep incoming x131/x150/x165/x166/
# x183 + kept q35 (q40/x215/x216 out, x215/x216 r13-green from birth);
# SQL surface keeps incoming q147 recursive + q150 pipe + q152
# parameterized (q155 out); X12 keeps kept x212/x217 (x200 out); stats
# keep incoming q137/x163/x167/x182/x177 (x209/x213/x210 out); dedup
# keeps incoming x146 linkage + x164 + x172 (x179/x194/x204 out — the
# persisted-LSH-index pair is below fold r13-green); similarity keeps
# incoming x154 PQ contract + x169 JL (x46/x71/x130/x133/x155/x198
# out); text keeps incoming x151 fertility + x143 + x171 (x48 out);
# Python surface keeps incoming x136 applyInArrow (x53/x77/x127 out);
# layout keeps kept x212 (x124 out); graph/iterative keep incoming
# x176 triangles + x178 k-means (x138 out); sampling/splits keep
# incoming x156 exact-stratified + x161 diversity (x104/x148/x214
# out, x214 r13-green from birth).
# Late-r14 swap for the operator BUILT this round, gated from birth:
# q152 parameterized-SQL (r7-green, safe below the fold until r16 and
# FIRST in line for rotation #13) -> x220 maintained-view cascade
# (base feeds -> IVM join view -> the view's own feed -> IVM
# aggregate view, symmetric-difference-vs-recompute pinned 0; the SQL
# surface keeps q147 recursive + q150 pipe in window).
# NEXT (rotation #13, round 15): q152 parameterized-SQL (deferred
# above) + the r8 cohort (18 rows, fails entering r17) plus as many
# of the 23-row r9 cohort as slots allow; pre-pull r10 rows with any
# spare slots — r10 holds 32 rows and cannot fit in r18's window
# alone alongside its own keeps.
DRIVER_WINDOW: tuple[str, ...] = (
    # r6 staleness cohort (17)
    "q123_hll_union_contract",
    "q147_recursive_hierarchy",
    "q150_pipe_syntax",
    "x136_lang_stats_applyinarrow",
    "x142_cdc_chunks",
    "x143_unicode_normalize",
    "x151_tokenizer_fertility",
    "x153_exif_probe",
    "x154_pq_recall_contract",
    "x170_inverted_index",
    "x175_column_profile",
    "x176_copurchase_triangles",
    "x177_rolling_mad_anomaly",
    "x178_kmeans_lloyd",
    "x182_annotator_agreement",
    "x184_rfm_segmentation",
    "x97_sequence_pack",
    # r7 staleness cohort (24), taken one round early in full
    "q119_string_agg",
    "q137_bivariate_stats",
    "q140_bitmap_exact_distinct",
    "q144_gap_fill_locf",
    "q146_histogram_equi_width",
    "q151_collation_group",
    "q168_growth_accounting",
    "x131_temperature_resample",
    "x146_record_linkage",
    "x150_epoch_upsample",
    "x156_stratified_exact_sample",
    "x157_quality_constraints",
    "x160_url_canonicalize",
    "x161_source_diversity",
    "x163_lang_source_mi",
    "x164_dup_size_histogram",
    "x165_event_cooccurrence",
    "x166_event_path_trigrams",
    "x167_value_drift_psi",
    "x169_jl_projection",
    "x171_phrase_match",
    "x172_source_overlap",
    "x183_bot_cadence",
    # round-14 first-time gates, windowed from birth
    "x218_cidr_route_enrich",
    "x219_weighted_median",
    "x220_ivm_agg_cascade",
    # kept family representatives (see the rotation note)
    "q95_market_share",
    "q35_asof_join",
    "q11_setop_union",
    "x202_table_reconcile",
    "x111_pii_scrub",
    "x212_snapshot_layout_health",
    "x217_ivm_join_view",
)


def query(name: str, oracle: str | None = None):
    """Decorator registering a query under ``name`` with its oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "")
        return fn

    return deco


def all_queries() -> dict[str, QuerySpec]:
    # Import side effect: populates the registry.
    import ua2sql_spark.queries  # noqa: F401

    ordered: dict[str, QuerySpec] = {}
    for name in DRIVER_WINDOW:
        ordered[name] = _REGISTRY[name]  # KeyError = window lists a ghost
    for name, spec in _REGISTRY.items():
        if name not in ordered:
            ordered[name] = spec
    return ordered


def _tuned(fn: QueryFn) -> QueryFn:
    """Wrap a query so it first applies the engine's runtime confs to
    whatever SparkSession the caller provides (the driver harness builds
    its own session — UTC timezone in particular must hold for the
    DuckDB oracle's naive timestamps to compare equal)."""

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        from ua2sql_spark.session import tune_for_session

        tune_for_session(spark)
        return fn(spark, sf_dir)

    return run


def queries() -> dict[str, QueryFn]:
    return {name: _tuned(spec.fn) for name, spec in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in all_queries().items() if spec.oracle is not None}

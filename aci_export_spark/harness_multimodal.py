"""Harness entries for the multimodal binary-column stages (multimodal.py).

The deterministic fake-decode derives every output value from the payload
bytes with arithmetic DuckDB can replay over the source text column
(octet_length/md5/integer division), so the mapInPandas plumbing — binary
schema, Arrow batch shape, fan-out — is verified end to end by the oracle,
not just smoke-checked. frame_checksum (md5 of a *byte slice*) is not
SQL-replayable on non-ASCII text, so it is asserted in pytest instead and
excluded from the oracle-facing projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from aci_export_spark.harness import register
from aci_export_spark.sources import read_table
from aci_export_spark import multimodal as MM

_BYTE_LEN = "octet_length(encode(text))"
_MEDIA_TYPE = (
    "CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END"
)


@register(
    "mm_decode_metadata",
    f"""
SELECT doc_id,
       {_MEDIA_TYPE} AS media_type,
       {_BYTE_LEN} AS byte_len,
       md5(text) AS checksum,
       64 + {_BYTE_LEN} % 449 AS width,
       64 + ({_BYTE_LEN} * 7) % 257 AS height
FROM documents
""",
    doc="multimodal decode stage: binary payload → typed metadata via "
    "mapInPandas (Arrow batches, no shuffle); deterministic fake decode, "
    "md5/length/dims replayed exactly by the oracle",
)
def mm_decode_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = MM.attach_media(read_table(spark, sf_dir, "documents"))
    return MM.decode_metadata(media)


@register(
    "mm_resize_plan",
    f"""
WITH d AS (
    SELECT doc_id, {_BYTE_LEN} AS byte_len,
           64 + {_BYTE_LEN} % 449 AS width,
           64 + ({_BYTE_LEN} * 7) % 257 AS height
    FROM documents
)
SELECT doc_id, byte_len, width, height,
       CASE WHEN GREATEST(width, height) <= 128 THEN width
            ELSE width * 128 // GREATEST(width, height) END AS new_width,
       CASE WHEN GREATEST(width, height) <= 128 THEN height
            ELSE height * 128 // GREATEST(width, height) END AS new_height,
       CASE WHEN GREATEST(width, height) <= 128 THEN byte_len
            ELSE byte_len * 128 // GREATEST(width, height) END AS new_byte_len
FROM d
""",
    doc="multimodal resize stage: max-dim 128 scaling with pure integer "
    "arithmetic (bit-identical across engines); payload resize is the "
    "proportional byte prefix in the fake, a pixel re-encode for real",
)
def mm_resize_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = MM.attach_media(read_table(spark, sf_dir, "documents"))
    return MM.resize_plan(media, max_dim=128)


@register(
    "mm_frame_sample",
    f"""
WITH d AS (SELECT doc_id, {_BYTE_LEN} AS byte_len FROM documents)
SELECT d.doc_id, f.frame_no,
       f.frame_no * 1000 AS frame_offset,
       LEAST(1000, d.byte_len - f.frame_no * 1000) AS frame_len
FROM d, LATERAL (
    SELECT unnest(range(0, GREATEST(1, CAST(ceil(d.byte_len / 1000.0) AS BIGINT)))) AS frame_no
) f
""",
    doc="multimodal frame-sampling stage: each asset fans out to "
    "ceil(bytes/1000) frame rows via mapInPandas (linear growth, no "
    "shuffle); byte-slice checksums pytest-verified (not SQL-replayable)",
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = MM.attach_media(read_table(spark, sf_dir, "documents"))
    return MM.sample_frames(media).select(
        "doc_id", "frame_no", "frame_offset", "frame_len"
    )


@register(
    "mm_phash_pairs",
    """
WITH ph AS (
    SELECT doc_id,
           CAST(SUM(CASE WHEN ord(substr(text, ((k + k // 8) * 7)
                                          % GREATEST(length(text), 1) + 1, 1))
                       < ord(substr(text, ((k + k // 8 + 1) * 7)
                                          % GREATEST(length(text), 1) + 1, 1))
                    THEN (1::BIGINT << k) ELSE 0 END) AS BIGINT) AS phash
    FROM documents, unnest(generate_series(0, 55)) AS t(k)
    GROUP BY doc_id
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.phash, b.phash)) AS INTEGER) AS hamming
FROM ph a JOIN ph b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.phash, b.phash)) <= 6
""",
    doc="perceptual-hash image dedup (dHash over the decoded luma grid, "
    "LAION-style): mapInPandas decode+hash stage (the codec boundary) -> "
    "pigeonhole-blocked Hamming pair join with exact bit_count verify "
    "(llm/dedup.hamming_pairs_blocked, guaranteed recall). The oracle "
    "recomputes the 56-bit hash from the text bytes and brute-forces all "
    "pairs — exactly what the blocking must reproduce",
)
def mm_phash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = MM.attach_media(read_table(spark, sf_dir, "documents"))
    return MM.phash_pairs(media, max_hamming=6)


@register(
    "mm_av_metadata",
    f"""
SELECT doc_id,
       {_MEDIA_TYPE} AS media_type,
       {_BYTE_LEN} AS byte_len,
       CASE WHEN {_MEDIA_TYPE} IN ('audio', 'video')
            THEN 1000 + ({_BYTE_LEN} * 13) % 59000 END AS duration_ms,
       CASE WHEN {_MEDIA_TYPE} = 'audio'
            THEN 8000 + ({_BYTE_LEN} % 37) * 1000 END AS sample_rate,
       CASE WHEN {_MEDIA_TYPE} = 'audio'
            THEN 1 + {_BYTE_LEN} % 2 END AS channels,
       CASE WHEN {_MEDIA_TYPE} IN ('image', 'video')
            THEN 64 + {_BYTE_LEN} % 449 END AS width,
       CASE WHEN {_MEDIA_TYPE} IN ('image', 'video')
            THEN 64 + ({_BYTE_LEN} * 7) % 257 END AS height
FROM documents
""",
    doc="modality-typed A/V container metadata (duration / sample rate / "
    "channels / display dims, NULL where the modality lacks the field) via "
    "the same Arrow-batched shuffle-free mapInPandas stage; real=True "
    "parses genuine WAV fmt/data chunks and MP4 moov/mvhd+tkhd boxes with "
    "pure struct reads (container metadata lives in headers, no codec "
    "needed — pytest-verified on synthesized containers); the oracle "
    "replays the deterministic fake",
)
def mm_av_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = MM.attach_media(read_table(spark, sf_dir, "documents"))
    return MM.decode_av_metadata(media)


@register(
    "mm_audio_stats",
    f"""
WITH d AS (SELECT doc_id, {_BYTE_LEN} AS byte_len FROM documents),
s AS (
    SELECT d.doc_id, d.byte_len,
           ((d.doc_id * 2654435761 + i.i * 40503) % 65536) - 32768 AS smp
    FROM d, LATERAL (
        SELECT unnest(range(0, 64 + d.byte_len % 193)) AS i
    ) i
)
SELECT doc_id,
       64 + byte_len % 193 AS n_samples,
       8000 + (byte_len % 37) * 1000 AS sample_rate,
       CAST(MAX(ABS(smp)) AS BIGINT) AS peak_abs,
       CAST(SUM(ABS(smp)) AS BIGINT) AS sum_abs,
       CAST(SUM(smp * smp) AS BIGINT) AS sum_sq,
       CAST(SUM(CASE WHEN ABS(smp) < 512 THEN 1 ELSE 0 END) AS BIGINT)
           AS silent_samples,
       CAST(SUM(CASE WHEN smp IN (-32768, 32767) THEN 1 ELSE 0 END) AS BIGINT)
           AS clipped_samples
FROM s
GROUP BY doc_id, byte_len
""",
    doc="audio amplitude stats over DECODED PCM samples: synthesize a real "
    "RIFF/WAVE container per document (16-bit PCM, samples from integer "
    "arithmetic over (doc_id, i)), then decode it back with the pure "
    "struct+numpy WAV decoder (multimodal.decode_wav_samples — chunk walk "
    "honoring word alignment, frombuffer int16) and compute peak / exact "
    "integer sum(|s|), sum(s^2) / silence / clipping counts. The oracle "
    "replays the sample formula arithmetically — so a decode bug (wrong "
    "chunk offset, endianness, sign) breaks the hash match. Two "
    "mapInPandas stages, no shuffle; samples never leave the executor",
)
def mm_audio_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = MM.attach_audio(read_table(spark, sf_dir, "documents"))
    return MM.audio_stats(media)


@register(
    "mm_audio_silence_segments",
    f"""
WITH d AS (SELECT doc_id, {_BYTE_LEN} AS byte_len FROM documents),
s AS (
    SELECT d.doc_id, d.byte_len, i.i,
           CASE WHEN (i.i // 32) % 2 = 0 THEN 0
                ELSE ((d.doc_id * 2654435761 + i.i * 40503) % 65536) - 32768
           END AS smp
    FROM d, LATERAL (
        SELECT unnest(range(0, 64 + d.byte_len % 193)) AS i
    ) i
),
sil AS (
    SELECT doc_id, i,
           i - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY i) AS grp
    FROM s WHERE ABS(smp) < 512
),
runs AS (
    SELECT doc_id, grp, COUNT(*) AS len FROM sil GROUP BY 1, 2
),
q AS (
    SELECT doc_id, COUNT(*)::BIGINT AS n_runs,
           SUM(len)::BIGINT AS silent_in_runs,
           MAX(len)::BIGINT AS longest_run
    FROM runs WHERE len >= 8 GROUP BY 1
)
SELECT d.doc_id,
       (64 + d.byte_len % 193)::BIGINT AS n_samples,
       COALESCE(q.n_runs, 0)::BIGINT AS n_runs,
       COALESCE(q.silent_in_runs, 0)::BIGINT AS silent_in_runs,
       COALESCE(q.longest_run, 0)::BIGINT AS longest_run
FROM d LEFT JOIN q USING (doc_id)
""",
    doc="silence-run segmentation over DECODED PCM (the trim/split "
    "primitive of audio curation): synthesize gated-envelope WAVs (even "
    "32-sample blocks silenced — genuine multi-sample silent runs), "
    "decode with the real RIFF walker, then find maximal |s|<512 runs of "
    ">=8 samples via one vectorized boundary diff per asset. The oracle "
    "replays the gated sample formula and the run structure with a "
    "gaps-and-islands window — a decode offset/endianness bug or an "
    "off-by-one in run boundaries breaks the hash. mapInPandas, no "
    "shuffle, samples never leave the executor",
)
def mm_audio_silence_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = MM.attach_audio_gated(read_table(spark, sf_dir, "documents"))
    return MM.audio_silence_segments(media, threshold=512, min_run=8)


@register(
    "mm_mp4_tracks",
    f"""
WITH d AS (SELECT doc_id, {_BYTE_LEN} AS byte_len FROM documents),
tr AS (
    SELECT d.doc_id, d.byte_len, t.t AS track_id
    FROM d, LATERAL (
        SELECT unnest(CASE WHEN d.doc_id % 2 = 1 THEN [1, 2] ELSE [1] END) AS t
    ) t
),
base AS (
    SELECT doc_id, byte_len, track_id,
           CASE WHEN track_id = 1 THEN 'vide' ELSE 'soun' END AS handler,
           600 * track_id + (byte_len % 5) * 120 AS timescale,
           16 + (byte_len + 31 * track_id) % 97 AS n_samples,
           100 + byte_len % 11 AS delta1
    FROM tr
),
sz AS (
    SELECT b.doc_id, b.track_id,
           CAST(SUM(200 + (b.doc_id + i.i * b.track_id) % 800) AS BIGINT)
               AS total_bytes
    FROM base b, LATERAL (SELECT unnest(range(0, b.n_samples)) AS i) i
    GROUP BY 1, 2
),
dur AS (
    SELECT *,
           (n_samples // 2) * delta1
               + (n_samples - n_samples // 2) * (delta1 + 50) AS duration_ticks
    FROM base
)
SELECT b.doc_id,
       CAST(b.track_id AS BIGINT) AS track_id,
       b.handler,
       CAST(b.timescale AS BIGINT) AS timescale,
       CAST(b.n_samples AS BIGINT) AS n_samples,
       CAST(b.duration_ticks AS BIGINT) AS duration_ticks,
       CAST(b.duration_ticks * 1000 // b.timescale AS BIGINT) AS duration_ms,
       sz.total_bytes,
       CAST(sz.total_bytes * 8 * b.timescale // b.duration_ticks AS BIGINT)
           AS avg_bitrate_bps,
       CAST((b.n_samples + 9) // 10 AS BIGINT) AS n_chunks
FROM dur b JOIN sz USING (doc_id, track_id)
""",
    doc="MP4 sample-table statistics over REAL ISO-BMFF containers: "
    "synthesize a genuine box tree per document (moov/trak/mdia/stbl with "
    "stts runs, per-sample stsz, stsc chunk runs, stco AND co64 offsets), "
    "then parse it back with pure struct reads "
    "(multimodal.parse_mp4_tracks — cross-validates stts·stsz·stsc·stco "
    "consistency and raises on truncation) for per-track frame count, "
    "EXACT tick duration from the sample deltas, total sample bytes, and "
    "integer average bitrate. The oracle replays the synthesis arithmetic "
    "— a box-offset/endianness/run-expansion bug breaks the hash. Two "
    "mapInPandas stages, no shuffle; mdat never touched",
)
def mm_mp4_tracks(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = MM.attach_mp4(read_table(spark, sf_dir, "documents"))
    return MM.mp4_track_stats(media)


@register(
    "mm_mp4_sample_ranges",
    f"""
WITH d AS (SELECT doc_id, {_BYTE_LEN} AS byte_len FROM documents),
tr AS (
    SELECT d.doc_id, d.byte_len, t.t AS track_id
    FROM d, LATERAL (
        SELECT unnest(CASE WHEN d.doc_id % 2 = 1 THEN [1, 2] ELSE [1] END) AS t
    ) t
),
samp AS (
    SELECT tr.doc_id, tr.track_id, i.i AS idx,
           200 + (tr.doc_id + i.i * tr.track_id) % 800 AS size
    FROM tr, LATERAL (
        SELECT unnest(range(0, 16 + (tr.byte_len + 31 * tr.track_id) % 97)) AS i
    ) i
)
SELECT doc_id,
       CAST(track_id AS BIGINT) AS track_id,
       CAST(idx + 1 AS BIGINT) AS sample_no,
       CAST(idx // 10 + 1 AS BIGINT) AS chunk_no,
       CAST(4096 * track_id
            + COALESCE(SUM(size) OVER (
                  PARTITION BY doc_id, track_id ORDER BY idx
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            AS BIGINT) AS offset,
       CAST(size AS BIGINT) AS size
FROM samp
""",
    doc="per-sample byte-range fetch plan from REAL MP4 sample tables: "
    "stsc run expansion assigns samples to chunks, stco/co64 anchors each "
    "chunk, the within-chunk stsz prefix sum positions each sample — the "
    "random-access read plan a frame-extraction stage needs to fetch "
    "samples without scanning mdat (linear fan-out, one row per sample). "
    "The synthesized containers lay chunks contiguously, so the oracle "
    "replays offsets as a plain cumulative sum — but the Spark side walks "
    "the REAL chunk indirection, so a wrong stsc/stco expansion (the "
    "classic off-by-one-chunk bug) breaks the hash even though the "
    "arithmetic LOOKS like a cumsum",
)
def mm_mp4_sample_ranges(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = MM.attach_mp4(read_table(spark, sf_dir, "documents"))
    return MM.mp4_sample_table(media)


@register(
    "mm_bmp_pixel_stats",
    f"""
WITH d AS (SELECT doc_id, {_BYTE_LEN} AS byte_len FROM documents),
dims AS (
    SELECT doc_id, 4 + byte_len % 29 AS w, 3 + byte_len % 17 AS h FROM d
),
px AS (
    SELECT doc_id, w, h,
           (3 * doc_id + 13 * x.x + 17 * y.y) % 256 AS r,
           (2 * doc_id + 5 * x.x + 11 * y.y) % 256 AS g,
           (1 * doc_id + 3 * x.x + 7 * y.y) % 256 AS b
    FROM dims,
         LATERAL (SELECT unnest(range(0, w)) AS x) x,
         LATERAL (SELECT unnest(range(0, h)) AS y) y
)
SELECT doc_id,
       CAST(w AS BIGINT) AS width,
       CAST(h AS BIGINT) AS height,
       SUM(r)::BIGINT AS sum_r,
       SUM(g)::BIGINT AS sum_g,
       SUM(b)::BIGINT AS sum_b,
       MAX(r + g + b)::BIGINT AS peak_rgb
FROM px GROUP BY doc_id, w, h
""",
    doc="channel statistics over DECODED BMP pixels: synthesize a genuine "
    "24-bit DIB per document (4-byte row stride with 0xAA pad sentinels; "
    "even doc_ids bottom-up, odd top-down via negative biHeight), decode "
    "with the pure struct+numpy BMP reader (multimodal.decode_bmp_pixels "
    "— honors both orientations, strips stride padding, swaps BGR to "
    "RGB), and emit exact integer channel sums + peak r+g+b. The oracle "
    "replays the pixel formula arithmetically — a stride, orientation, "
    "or channel-order bug breaks the hash. Two mapInPandas stages, no "
    "shuffle; pixels never leave the executor",
)
def mm_bmp_pixel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = MM.attach_bmp(read_table(spark, sf_dir, "documents"))
    return MM.bmp_pixel_stats(media)


@register(
    "mm_audio_g711_stats",
    f"""
WITH d AS (SELECT doc_id, {_BYTE_LEN} AS byte_len FROM documents),
c AS (
    SELECT d.doc_id, d.byte_len,
           (d.doc_id * 2654435761 + i.i * 40503) % 256 AS code
    FROM d, LATERAL (
        SELECT unnest(range(0, 64 + d.byte_len % 193)) AS i
    ) i
),
lin AS (
    SELECT doc_id, byte_len,
           CASE WHEN doc_id % 2 = 0 THEN
               -- mu-law (ITU G.711): u = ~code; t = ((m<<3)+132)<<e
               CASE WHEN (255 - code) >= 128
                    THEN 132 - (((255 - code) % 16) * 8 + 132)
                             * (1::BIGINT << (((255 - code) % 128) // 16))
                    ELSE (((255 - code) % 16) * 8 + 132)
                             * (1::BIGINT << (((255 - code) % 128) // 16)) - 132
               END
           ELSE
               -- A-law: a = code ^ 0x55; segment expansion
               CASE WHEN xor(code, 85) >= 128 THEN 1 ELSE -1 END *
               CASE WHEN (xor(code, 85) % 128) // 16 = 0
                         THEN (xor(code, 85) % 16) * 16 + 8
                    WHEN (xor(code, 85) % 128) // 16 = 1
                         THEN (xor(code, 85) % 16) * 16 + 264
                    ELSE ((xor(code, 85) % 16) * 16 + 264)
                         * (1::BIGINT << ((xor(code, 85) % 128) // 16 - 1))
               END
           END AS s
    FROM c
)
SELECT doc_id,
       CASE WHEN doc_id % 2 = 0 THEN 'mulaw' ELSE 'alaw' END AS law,
       (64 + byte_len % 193)::BIGINT AS n_samples,
       CAST(MAX(ABS(s)) AS BIGINT) AS peak_abs,
       CAST(SUM(ABS(s)) AS BIGINT) AS sum_abs,
       CAST(SUM(s * s) AS BIGINT) AS sum_sq
FROM lin GROUP BY doc_id, byte_len
""",
    doc="G.711 companded-audio decode (the telephony half of real-world "
    "WAV): synthesize genuine mu-law (even doc_ids, fmt tag 7) and A-law "
    "(odd, tag 6) containers, expand to linear with the ITU reference "
    "integer arithmetic inside decode_wav_samples (no tables, no codec "
    "dependency), emit exact amplitude stats. The oracle replays the "
    "companding expansion formula — a sign, bias, or segment-shift bug "
    "breaks the hash. The law column derives from the container's fmt "
    "tag, so a synth/decode pairing bug also surfaces",
)
def mm_audio_g711_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = MM.attach_audio_g711(read_table(spark, sf_dir, "documents"))
    return MM.audio_g711_stats(media)


@register(
    "mm_tiff_pages",
    f"""
WITH d AS (SELECT doc_id, {_BYTE_LEN} AS byte_len FROM documents),
pg AS (
    SELECT d.doc_id, d.byte_len, p.p AS page_no
    FROM d, LATERAL (SELECT unnest(range(0, 1 + d.doc_id % 3)) AS p) p
)
SELECT doc_id,
       CAST(page_no AS BIGINT) AS page_no,
       CAST(4 + (byte_len + 13 * page_no) % 29 AS BIGINT) AS width,
       CAST(3 + (byte_len + 7 * page_no) % 17 AS BIGINT) AS height,
       8::BIGINT AS bits_per_sample,
       1::BIGINT AS compression,
       CAST((4 + (byte_len + 13 * page_no) % 29)
            * (3 + (byte_len + 7 * page_no) % 17) AS BIGINT) AS strip_byte_counts
FROM pg
""",
    doc="multi-page TIFF metadata via a real IFD-chain walk: synthesize "
    "genuine baseline TIFFs (1-3 linked IFDs; even doc_ids little-endian "
    "'II', odd big-endian 'MM'), parse with multimodal.parse_tiff_meta — "
    "byte order applied to every integer field and SHORT values read "
    "LEFT-JUSTIFIED from the entry value field (the two classic TIFF "
    "parser bugs; either breaks the hash on half the corpus). One-asset-"
    "to-page-rows fan-out, mapInPandas, no shuffle",
)
def mm_tiff_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = MM.attach_tiff(read_table(spark, sf_dir, "documents"))
    return MM.tiff_pages(media)


@register(
    "mm_flac_streaminfo",
    f"""
WITH d AS (SELECT doc_id, {_BYTE_LEN} AS byte_len FROM documents)
SELECT doc_id,
       CAST(8000 + (byte_len % 37) * 1000 AS BIGINT) AS sample_rate,
       CAST(1 + doc_id % 8 AS BIGINT) AS channels,
       CAST(8 + (doc_id % 3) * 4 AS BIGINT) AS bits_per_sample,
       CAST((doc_id * 977 + byte_len * 131) % 68719476736 AS BIGINT) AS total_samples,
       CAST(((doc_id * 977 + byte_len * 131) % 68719476736) * 1000
            // (8000 + (byte_len % 37) * 1000) AS BIGINT) AS duration_ms
FROM d
""",
    doc="FLAC STREAMINFO via genuine bit-packed decode: 20-bit sample "
    "rate, 3-bit channels, 5-bit bits-per-sample and 36-bit total-sample "
    "fields crossing byte boundaries (the parse byte-aligned readers get "
    "wrong), block chain walked past a trailing PADDING block; exact "
    "integer duration. The oracle replays the synthesis arithmetic — a "
    "shift/mask error breaks the hash. mapInPandas, no shuffle",
)
def mm_flac_streaminfo(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = MM.attach_flac(read_table(spark, sf_dir, "documents"))
    return MM.flac_streaminfo(media)


@register(
    "mm_mp3_stream_info",
    f"""
WITH d AS (SELECT doc_id, {_BYTE_LEN} AS byte_len FROM documents),
br AS (SELECT * FROM (VALUES (1,32),(2,40),(3,48),(4,56),(5,64),(6,80),(7,96),
       (8,112),(9,128),(10,160),(11,192),(12,224),(13,256),(14,320)) t(idx, kbps)),
sr AS (SELECT * FROM (VALUES (0,44100),(1,48000),(2,32000)) t(idx, hz))
SELECT d.doc_id,
       CAST(4 + d.byte_len % 9 AS BIGINT) AS n_frames,
       CAST(br.kbps AS BIGINT) AS bitrate_kbps,
       CAST(sr.hz AS BIGINT) AS sample_rate,
       CAST((4 + d.byte_len % 9) * 1152 * 1000 // sr.hz AS BIGINT) AS duration_ms
FROM d JOIN br ON br.idx = 1 + d.doc_id % 14
       JOIN sr ON sr.idx = d.doc_id % 3
""",
    doc="MP3 stream facts via a REAL frame-header walk: each frame's "
    "length computed from its own header (144*bitrate/samplerate + "
    "padding, padding alternating per frame so lengths differ), a "
    "leading ID3v2 tag skipped by its syncsafe size on odd doc_ids; "
    "CBR bitrate, frame count, exact 1152-samples-per-frame duration. "
    "A wrong bitrate/samplerate table entry or padding handling desyncs "
    "the walk and raises; the oracle replays the synthesis arithmetic "
    "through the same VALUES tables. mapInPandas, no shuffle; frame "
    "bodies never decoded (Huffman audio is codec-gated)",
)
def mm_mp3_stream_info(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = MM.attach_mp3(read_table(spark, sf_dir, "documents"))
    return MM.mp3_stream_info(media)


@register(
    "mm_zip_entries",
    f"""
WITH d AS (SELECT doc_id, {_BYTE_LEN} AS byte_len FROM documents),
e AS (
    SELECT d.doc_id, j.j AS entry_no,
           'f' || lpad(CAST(j.j AS VARCHAR), 2, '0') || '.txt' AS file_name,
           CAST(10 + (d.doc_id + j.j) % 40 AS BIGINT) AS usize
    FROM d, LATERAL (SELECT unnest(range(0, 1 + d.byte_len % 5)) AS j) j
)
SELECT doc_id, CAST(entry_no AS BIGINT) AS entry_no, file_name,
       usize AS uncompressed_size,
       usize AS compressed_size,
       CAST(COALESCE(SUM(37 + usize) OVER (
                PARTITION BY doc_id ORDER BY entry_no
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            AS BIGINT) AS local_offset
FROM e
""",
    doc="ZIP central-directory walk over genuine archives (the epub/docx/"
    "jar wrapper): EOCD located by BACKWARD signature scan past a "
    "variable-length comment (the step offset-zero readers get wrong), "
    "central entries parsed, each local-header signature cross-checked "
    "at its offset and the stored data's CRC32 validated during the walk "
    "— a wrong offset reads wrong bytes and raises. Synthesized archives "
    "also verify under Python's stdlib zipfile (independent reader "
    "agreement, pytest). Oracle replays names/sizes and offsets as a "
    "window cumsum. Compressed methods gated (stored only). mapInPandas, "
    "asset->entry-rows linear fan-out",
)
def mm_zip_entries(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = MM.attach_zip(read_table(spark, sf_dir, "documents"))
    return MM.zip_entries(media)


@register(
    "mm_exif_tags",
    f"""
WITH d AS (SELECT doc_id, {_BYTE_LEN} AS byte_len FROM documents)
SELECT doc_id,
       CAST(1 + doc_id % 8 AS BIGINT) AS orientation,
       'Cam' || CAST(doc_id % 5 AS VARCHAR) AS make,
       '2026:01:' || lpad(CAST(1 + byte_len % 28 AS VARCHAR), 2, '0') || ' '
         || lpad(CAST(doc_id % 24 AS VARCHAR), 2, '0') || ':'
         || lpad(CAST(byte_len % 60 AS VARCHAR), 2, '0') || ':'
         || lpad(CAST((doc_id + byte_len) % 60 AS VARCHAR), 2, '0')
         AS capture_dt,
       CAST(100 * (1 + doc_id % 32) AS BIGINT) AS iso,
       CAST(640 + byte_len % 3000 AS BIGINT) AS pixel_x
FROM d
""",
    doc="EXIF/APP1 metadata via a real JPEG marker walk + the shared TIFF "
    "IFD reader (r9 verdict ask #4): APP1 located by segment lengths "
    "(fill bytes tolerated), 'Exif\\0\\0' verified, the embedded TIFF's "
    "IFD0 walked honoring BOTH byte orders (even doc_ids II, odd MM), "
    "orientation validated 1..8, Make/DateTime read through ASCII offset "
    "indirection, ISO/PixelXDimension from the pointed-to Exif sub-IFD. "
    "capture_dt stays the spec's ASCII form (engine-portable). Oracle "
    "replays the synthesis arithmetic — a byte-order or offset slip "
    "breaks the hash on half the corpus. mapInPandas, no shuffle",
)
def mm_exif_tags(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = MM.attach_exif_jpeg(read_table(spark, sf_dir, "documents"))
    return MM.exif_tags(media)


@register(
    "mm_srt_cues",
    f"""
WITH d AS (SELECT doc_id, {_BYTE_LEN} AS byte_len FROM documents),
c AS (
    SELECT d.doc_id, d.byte_len, i.i AS idx,
           (d.doc_id * 13 + i.i * 41) % 1500 AS gap,
           700 + (d.doc_id * 31 + i.i * 97) % 2500 AS dur,
           2 + (d.byte_len + d.doc_id + i.i) % 9 AS nw
    FROM d, LATERAL (SELECT unnest(range(0, 1 + d.doc_id % 6)) AS i) i
), timed AS (
    SELECT doc_id, idx, dur, nw,
           CAST(COALESCE(SUM(gap + dur) OVER (
               PARTITION BY doc_id ORDER BY idx
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + gap
               AS BIGINT) AS start_ms
    FROM c
)
SELECT doc_id, CAST(idx + 1 AS BIGINT) AS cue_no, start_ms,
       CAST(start_ms + dur AS BIGINT) AS end_ms,
       CAST(dur AS BIGINT) AS dur_ms,
       CAST(nw AS BIGINT) AS n_words,
       CAST(nw * 60000 // dur AS BIGINT) AS words_per_min
FROM timed
""",
    doc="SRT caption-cue parsing — the text side of video-text training "
    "pairs and the words-per-minute quality gate: genuine SRT files "
    "(CRLF on odd doc_ids, every third cue's text split across two "
    "lines — the two classic parser hazards) parsed with a strict "
    "grammar walk that validates index sequence, timestamp format, "
    "positive durations and cue monotonicity, raising on any violation. "
    "Cue start times replay in the oracle as a window cumsum over the "
    "synthesis gaps/durations; words-per-minute is one integer floor "
    "division. mapInPandas, no shuffle; asset->cue-rows linear fan-out; "
    "composes with mm_audio_silence_segments for caption/speech "
    "alignment",
)
def mm_srt_cues(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = MM.attach_srt(read_table(spark, sf_dir, "documents"))
    return MM.srt_cues(media)


@register(
    "mm_id3_tags",
    """
WITH d AS (SELECT doc_id FROM documents)
SELECT doc_id, CAST(f.n AS BIGINT) AS frame_no, f.fid AS frame_id,
       CASE f.n
            WHEN 0 THEN 'Title ' || CAST(doc_id AS VARCHAR)
            WHEN 1 THEN 'Artist ' || CAST(doc_id % 17 AS VARCHAR)
            WHEN 2 THEN 'Album ' || CAST(doc_id % 7 AS VARCHAR)
            ELSE CAST(1 + doc_id % 12 AS VARCHAR) || '/12'
       END AS value
FROM d, (VALUES (0, 'TIT2'), (1, 'TPE1'), (2, 'TALB'), (3, 'TRCK'))
       AS f(n, fid)
""",
    doc="ID3v2.3 text-frame parsing over genuine tagged MP3s (the "
    "metadata container audio-text pairing and dedup keys come from): "
    "the walk syncsafe-decodes the TAG size but reads v2.3 FRAME sizes "
    "as plain big-endian (the spec distinction readers get wrong), "
    "decodes each text frame per its encoding byte — latin-1 on even "
    "doc_ids, UTF-16-with-BOM on odd (naive ASCII slicing garbles half "
    "the corpus and breaks the hash) — and stops at padding. The audio "
    "body after the tag is a genuine CBR frame sequence, so the blob "
    "round-trips parse_mp3_frames too (asserted in pytest). Oracle "
    "replays the four frame values as string arithmetic. mapInPandas, "
    "no shuffle",
)
def mm_id3_tags(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = MM.attach_id3_mp3(read_table(spark, sf_dir, "documents"))
    return MM.id3_tags(media)


@register(
    "mm_webvtt_cues",
    f"""
WITH d AS (SELECT doc_id, {_BYTE_LEN} AS byte_len FROM documents),
c AS (
    SELECT d.doc_id, d.byte_len, i.i AS idx,
           (d.doc_id * 17 + i.i * 53) % 1200 AS gap,
           600 + (d.doc_id * 29 + i.i * 83) % 2200 AS dur,
           2 + (d.byte_len + d.doc_id * 3 + i.i) % 8 AS nw
    FROM d, LATERAL (SELECT unnest(range(0, 1 + d.doc_id % 5)) AS i) i
), timed AS (
    SELECT doc_id, idx, dur, nw,
           CAST(COALESCE(SUM(gap + dur) OVER (
               PARTITION BY doc_id ORDER BY idx
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + gap
               AS BIGINT) AS start_ms
    FROM c
)
SELECT doc_id, CAST(idx + 1 AS BIGINT) AS cue_no, start_ms,
       CAST(start_ms + dur AS BIGINT) AS end_ms,
       CAST(dur AS BIGINT) AS dur_ms,
       CAST(nw AS BIGINT) AS n_words,
       CAST(nw * 60000 // dur AS BIGINT) AS words_per_min,
       (idx % 3 = 1) AS has_settings
FROM timed
""",
    doc="WebVTT caption-cue parsing — the web-native sibling of "
    "mm_srt_cues (the format browser/YouTube pipelines emit), with the "
    "three grammar deltas the synthesis plants: the mandatory WEBVTT "
    "header, OPTIONAL cue-identifier lines (even cues carry one), DOT "
    "millisecond separators with the hour field optional (even doc_ids "
    "write MM:SS.mmm), cue SETTINGS after the end timestamp (every i%3==1 "
    "cue), and NOTE comment blocks (every third file) that must be "
    "skipped. Strict-grammar walk raising on malformed timing, empty or "
    "overlapping cues. Oracle replays the synthesis gap/duration cumsum; "
    "mapInPandas, no shuffle, asset->cue-rows linear fan-out",
)
def mm_webvtt_cues(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = MM.attach_webvtt(read_table(spark, sf_dir, "documents"))
    return MM.webvtt_cues(media)


@register(
    "mm_warc_records",
    """
WITH d AS (
    SELECT doc_id, source, lang,
           trim(regexp_replace(text, '\\s+', ' ', 'g')) AS coll
    FROM documents
), base AS (
    SELECT doc_id,
           octet_length(encode(substr(coll, 1, 120))) + 19 AS bodylen,
           (doc_id % 4 = 0) AS has_info,
           'https://www.' || source || '.example.com/' || lang || '/'
               || CAST(doc_id % 100 AS VARCHAR) AS uri,
           length('GET /' || lang || '/' || CAST(doc_id % 100 AS VARCHAR)
               || ' HTTP/1.1') + 2
               + length('Host: www.' || source || '.example.com') + 4 AS reqlen
    FROM d
)
SELECT doc_id, 1::BIGINT AS rec_no, 'warcinfo' AS rec_type,
       26::BIGINT AS content_length, NULL::VARCHAR AS target_uri,
       NULL::BIGINT AS http_status, NULL::BIGINT AS body_bytes
FROM base WHERE has_info
UNION ALL
SELECT doc_id, (CASE WHEN has_info THEN 2 ELSE 1 END)::BIGINT, 'request',
       reqlen::BIGINT, uri, NULL::BIGINT, NULL::BIGINT
FROM base
UNION ALL
SELECT doc_id, (CASE WHEN has_info THEN 3 ELSE 2 END)::BIGINT, 'response',
       (44 + bodylen)::BIGINT, uri, 200::BIGINT, bodylen::BIGINT
FROM base
""",
    doc="WARC record parsing (ISO 28500) — THE web-corpus container "
    "(CommonCrawl ships every crawl as WARC), parsed by STRICT "
    "Content-Length framing: version line, header block, exactly "
    "Content-Length payload bytes, the two mandatory CRLFs — never by "
    "delimiter scanning, which the synthesis punishes by planting a "
    "CRLFCRLF + 'WARC/1.0' LOOKALIKE inside every response body (the "
    "classic web-archive reader bug; a scanner splits mid-record and "
    "the hash breaks). Optional warcinfo record, request + response "
    "records with HTTP status/body split. Oracle replays the synthesis "
    "length arithmetic. mapInPandas, no shuffle, linear fan-out",
)
def mm_warc_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = MM.attach_warc(read_table(spark, sf_dir, "documents"))
    return MM.warc_records(media)


@register(
    "mm_avro_blocks",
    """
WITH rec AS (
    SELECT source, doc_id,
           (length(bin(2 * doc_id)) + 6) // 7
               + (length(bin(2 * length(lang))) + 6) // 7
               + length(lang) AS rbytes
    FROM documents
)
SELECT source,
       ((COUNT(*) + 15) // 16)::BIGINT AS n_blocks,
       COUNT(*)::BIGINT AS n_records,
       SUM(doc_id)::BIGINT AS sum_ids,
       SUM(rbytes)::BIGINT AS payload_bytes
FROM rec GROUP BY source
""",
    doc="Avro Object Container File round trip — the standard event-"
    "pipeline landing format (Kafka->lake dumps): per source a genuine "
    "OCF is synthesized (magic, metadata map with schema+codec, "
    "md5-derived 16-byte sync marker, <=16-record blocks) and RE-PARSED; "
    "emitted stats come from the parser, so the two encoding details "
    "readers get wrong — longs are ZIGZAG varints (a plain-varint reader "
    "decodes 5 as 10) and every block must end with the header's sync "
    "marker (verified, raises on mismatch) — break the hash if mishandled. "
    "Oracle replays record-size arithmetic (varint byte counts via "
    "binary-string length). One applyInPandas keyed by source (container "
    "build is per-file by definition)",
)
def mm_avro_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    return MM.avro_container_stats(read_table(spark, sf_dir, "documents"))


@register(
    "mm_webp_info",
    f"""
WITH d AS (SELECT doc_id, {_BYTE_LEN} AS byte_len FROM documents)
SELECT doc_id,
       CASE WHEN doc_id % 2 = 1 THEN 'VP8L' ELSE 'VP8' END AS format,
       CAST(16 + doc_id % 1200 AS BIGINT) AS width,
       CAST(16 + byte_len % 700 AS BIGINT) AS height,
       byte_len % 3 = 0 AS has_alpha,
       doc_id % 5 = 0 AS has_exif,
       CAST(2 + CASE WHEN doc_id % 2 = 0 AND byte_len % 3 = 0 THEN 1 ELSE 0 END
              + CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END AS BIGINT) AS n_chunks
FROM d
""",
    doc="WebP header facts via a real RIFF chunk walk: VP8X feature flags "
    "+ 24-bit LE canvas, lossy VP8 (frame tag, 0x9D012A sync, 14-bit "
    "dims) on even doc_ids, lossless VP8L (0x2F signature, bit-packed LE "
    "dims crossing byte boundaries) on odd; the RIFF even-padding rule "
    "fires on the odd-length EXIF chunk, and the parser cross-checks the "
    "VP8X canvas and alpha/EXIF flags against the frame chunks, raising "
    "on disagreement. Oracle replays the synthesis arithmetic — a pad or "
    "bit-shift slip breaks the hash on half the corpus. mapInPandas, no "
    "shuffle",
)
def mm_webp_info(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = MM.attach_webp(read_table(spark, sf_dir, "documents"))
    return MM.webp_info(media)


@register(
    "mm_ogg_pages",
    f"""
WITH d AS (SELECT doc_id, {_BYTE_LEN} AS byte_len FROM documents),
p AS (
    SELECT d.doc_id, j.p AS page_no, 2 + d.byte_len % 4 AS n_pages
    FROM d, LATERAL (SELECT unnest(range(0, 2 + d.byte_len % 4)) AS p) j
)
SELECT doc_id, CAST(page_no AS BIGINT) AS page_no,
       CAST(4096 + doc_id % 1000 AS BIGINT) AS serial,
       CAST((page_no + 1) * (100 + doc_id % 50) AS BIGINT) AS granule,
       page_no = 0 AS is_bos,
       page_no = n_pages - 1 AS is_eos,
       CAST(200 + (doc_id * 7 + page_no * 13) % 400 AS BIGINT) AS payload_len,
       CAST((200 + (doc_id * 7 + page_no * 13) % 400) // 255 + 1 AS BIGINT)
           AS n_segments
FROM p
""",
    doc="Ogg (RFC 3533) page walk over genuine streams: every page's "
    "CRC-32 recomputed with the field zeroed using Ogg's DIRECT-form "
    "polynomial 0x04C11DB7 (init 0, unreflected — zlib's reflected CRC "
    "fails every page; pytest pins the 0x89A1897F check vector), lacing "
    "tables summed for payload length including the 255-boundary "
    "zero-lacing rule (exact-multiple payloads occur in the corpus), "
    "BOS/EOS flags and page-sequence contiguity validated. Oracle "
    "replays lengths/granules/serials via a lateral page range. "
    "mapInPandas, asset->page-rows linear fan-out, no shuffle",
)
def mm_ogg_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = MM.attach_ogg(read_table(spark, sf_dir, "documents"))
    return MM.ogg_pages(media)


@register(
    "mm_pdf_pages",
    f"""
WITH d AS (SELECT doc_id, {_BYTE_LEN} AS byte_len FROM documents),
p AS (
    SELECT d.doc_id, d.byte_len, j.p AS page_no
    FROM d, LATERAL (SELECT unnest(range(0, 1 + d.doc_id % 3)) AS p) j
)
SELECT doc_id,
       CAST(page_no AS BIGINT) AS page_no,
       CAST(3 + page_no AS BIGINT) AS page_obj,
       'pg' || CAST(page_no AS VARCHAR) || ' doc' || CAST(doc_id AS VARCHAR)
            || ' len' || CAST(byte_len AS VARCHAR) AS text,
       CAST(11 + length('pg' || CAST(page_no AS VARCHAR) || ' doc'
            || CAST(doc_id AS VARCHAR) || ' len'
            || CAST(byte_len AS VARCHAR)) AS BIGINT) AS content_len
FROM p
""",
    doc="PDF page-text extraction via a REAL classic-xref walk (the "
    "document-ingest format): startxref located by backward scan, xref "
    "entries validated as exactly-20-byte framed, every object reached "
    "ONLY through its xref offset (a corrupted offset lands on garbage "
    "and raises — never a rescue scan for 'N 0 obj'), /Count "
    "cross-checked against /Kids, each content stream's /Length "
    "cross-checked against its actual extent, text lifted from "
    "uncompressed BT/Tj/ET operators (/Filter decompression is "
    "codec-gated territory). Oracle replays the synthesis arithmetic "
    "including digit-width-dependent stream lengths. mapInPandas, "
    "asset->page-rows linear fan-out, no shuffle",
)
def mm_pdf_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = MM.attach_pdf(read_table(spark, sf_dir, "documents"))
    return MM.pdf_pages(media)


@register(
    "mm_mkv_tracks",
    f"""
WITH d AS (SELECT doc_id, {_BYTE_LEN} AS byte_len FROM documents),
t AS (
    SELECT d.doc_id, d.byte_len, j.p AS p
    FROM d, LATERAL (SELECT unnest(range(0, 1 + d.doc_id % 3)) AS p) j
)
SELECT doc_id,
       CAST(p + 1 AS BIGINT) AS track_no,
       CASE p % 3 WHEN 0 THEN 'video' WHEN 1 THEN 'audio'
                  ELSE 'subtitle' END AS track_type,
       CASE p % 3 WHEN 0 THEN 'V_VP9' WHEN 1 THEN 'A_OPUS'
                  ELSE 'S_TEXT/UTF8' END AS codec_id,
       CAST(1000000 + (byte_len % 7) * 1000 AS BIGINT) AS timestamp_scale,
       'matroska' AS doctype
FROM t
""",
    doc="Matroska/WebM track listing via a REAL EBML walk (RFC 8794): "
    "VINT decoding where element IDs keep their length-marker bit but "
    "sizes strip it (the classic confusion), minimal-width multi-byte "
    "VINTs genuinely present, the all-ones unknown-size encoding "
    "rejected, every nested walk required to land exactly on its "
    "parent's end, and the Info CRC-32 element verified with zlib's "
    "REFLECTED CRC over the remainder of its parent — the opposite "
    "convention from mm_ogg_pages' direct-form CRC, so swapping the two "
    "fails both queries loudly. Oracle replays the synthesis arithmetic. "
    "mapInPandas, asset->track-rows linear fan-out, no shuffle",
)
def mm_mkv_tracks(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = MM.attach_mkv(read_table(spark, sf_dir, "documents"))
    return MM.mkv_tracks(media)


@register(
    "mm_tar_entries",
    f"""
WITH d AS (SELECT doc_id, {_BYTE_LEN} AS byte_len FROM documents),
e AS (
    SELECT d.doc_id, d.byte_len, j.k AS entry_no
    FROM d, LATERAL (SELECT unnest(range(0, 1 + d.byte_len % 4)) AS k) j
)
SELECT doc_id,
       CAST(entry_no AS BIGINT) AS entry_no,
       'd' || CAST(doc_id AS VARCHAR) || '/f' || CAST(entry_no AS VARCHAR)
           || '.txt' AS file_name,
       CAST(10 + (doc_id * 13 + entry_no * 101) % 1500 AS BIGINT) AS size,
       CAST(1700000000 + doc_id * 37 + entry_no AS BIGINT) AS mtime,
       CAST(1 + (10 + (doc_id * 13 + entry_no * 101) % 1500 + 511) // 512
            AS BIGINT) AS n_blocks
FROM e
""",
    doc="POSIX ustar archive walk (the third archive container beside ZIP "
    "and WARC): 512-byte block framing, size/mtime read as OCTAL (a "
    "decimal read corrupts every offset after the first member), the "
    "header checksum validated under the spec's replaced-by-spaces rule, "
    "two-zero-block terminator enforced. Synthesized archives also parse "
    "under stdlib tarfile (independent reader agreement, pytest). Oracle "
    "replays name/size/mtime/block arithmetic. mapInPandas, "
    "asset->member-rows linear fan-out, no shuffle",
)
def mm_tar_entries(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = MM.attach_tar(read_table(spark, sf_dir, "documents"))
    return MM.tar_entries(media)


@register(
    "mm_gzip_members",
    f"""
WITH d AS (SELECT doc_id, {_BYTE_LEN} AS byte_len FROM documents)
SELECT doc_id,
       'doc' || CAST(doc_id AS VARCHAR) || '.bin' AS file_name,
       CAST(1700000000 + doc_id AS BIGINT) AS mtime,
       CAST(1 + doc_id % 3 AS BIGINT) AS n_blocks,
       CAST(20 + (doc_id * 11 + byte_len) % 900 AS BIGINT) AS payload_len
FROM d
""",
    doc="gzip member decode (RFC 1952) over REAL fully-decodable streams: "
    "stored deflate blocks (RFC 1951 BTYPE=00 — legal deflate, no "
    "Huffman codec needed; compressed BTYPEs raise a NAMED codec gate), "
    "optional-field header walk (FNAME NUL-terminated), the LEN/NLEN "
    "ones-complement check per block, and the CRC32+ISIZE trailer "
    "verified over the reassembled payload. Streams also decompress "
    "under stdlib gzip (independent reader agreement, pytest; crc32 "
    "asserted there — not SQL-replayable). The .warc.gz/.json.gz "
    "transport shape of web corpora. Oracle replays header/block/length "
    "arithmetic. mapInPandas, no shuffle",
)
def mm_gzip_members(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = MM.attach_gzip(read_table(spark, sf_dir, "documents"))
    return MM.gzip_members(media)

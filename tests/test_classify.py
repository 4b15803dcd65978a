"""Tests for model-based filtering: hashed n-gram linear classifier and
domain blocklist (operators/classify.py)."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from wine_label_ocr_spark.operators import classify as C


def test_hashed_ngram_features_counts(spark):
    """Feature counts == Counter over uni+bi-grams; buckets sorted,
    distinct; empty docs -> empty array; xxhash and md5 flavors agree on
    counts (bucket ids differ)."""
    rows = [(1, "a b a b a"), (2, "Mixed CASE mixed case"), (3, ""),
            (4, "solo")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for flavor in (False, True):
        got = df.select("doc_id", C.hashed_ngram_features(
            F.col("text"), 2, 1 << 16, oracle_safe=flavor).alias("f")).collect()
        for r in got:
            text = dict(rows)[r["doc_id"]]
            toks = [t.lower() for t in text.split()]
            grams = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
            want = Counter(grams)
            # counts must match as a multiset grouped by gram->bucket
            # (different grams may collide into one bucket: compare totals)
            assert sum(e["cnt"] for e in r["f"]) == sum(want.values())
            assert len(r["f"]) <= len(want)
            bks = [e["bucket"] for e in r["f"]]
            assert bks == sorted(bks) and len(bks) == len(set(bks))
            assert all(0 <= b < (1 << 16) for b in bks)


def test_linear_classifier_scores_and_plan(spark):
    """Exact integer logits against a hand-built weight table; docs with
    no in-vocab feature keep the bias; plan: weights broadcast, no
    (doc, bucket) shuffle of the raw gram explosion."""
    df = spark.createDataFrame(
        [(1, "good good great"), (2, "awful bad"), (3, "neutral words"),
         (4, "")],
        "doc_id long, text string")
    feats = df.select("doc_id", C.hashed_ngram_features(
        F.col("text"), 1, 1 << 16).alias("f"))
    fmap = {r["doc_id"]: {e["bucket"]: e["cnt"] for e in r["f"]}
            for r in feats.collect()}

    def bucket_of(word):
        r = spark.createDataFrame([(word,)], "g string").select(
            F.pmod(F.xxhash64("g", F.lit(0)), F.lit(1 << 16)).alias("b"))
        return r.collect()[0]["b"]

    wrows = [(bucket_of("good"), 500_000), (bucket_of("great"), 1_000_000),
             (bucket_of("awful"), -2_000_000), (bucket_of("bad"), -500_000)]
    weights = spark.createDataFrame(wrows, "bucket long, weight_scaled long")
    out = C.linear_text_classifier(df, weights, bias_scaled=100_000, n_max=1,
                                   n_buckets=1 << 16)
    got = {r["doc_id"]: r for r in out.collect()}
    assert got[1]["logit_scaled"] == 100_000 + 2 * 500_000 + 1_000_000
    assert got[1]["keep"] is True
    assert got[2]["logit_scaled"] == 100_000 - 2_000_000 - 500_000
    assert got[2]["keep"] is False
    assert got[3]["logit_scaled"] == 100_000  # no in-vocab features
    assert got[4]["logit_scaled"] == 100_000 and got[4]["n_features"] == 0
    assert set(got) == {1, 2, 3, 4}  # nothing silently dropped
    assert fmap[1][bucket_of("good")] == 2

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "hashpartitioning(doc_id" in plan  # the one narrow re-agg
    assert "hashpartitioning(bucket" not in plan


def test_host_suffixes_and_blocklist(spark):
    sfx = spark.createDataFrame(
        [("a.b.Example.COM",), ("example.com",), ("localhost",)],
        "h string").select("h", C.host_suffixes(F.col("h")).alias("s")).collect()
    got = {r["h"]: r["s"] for r in sfx}
    assert got["a.b.Example.COM"] == ["example.com", "b.example.com",
                                      "a.b.example.com"]
    assert got["example.com"] == ["example.com"]
    assert got["localhost"] == ["localhost"]

    bl = spark.createDataFrame([("example.com",), ("bad.org",)], "domain string")
    urls = spark.createDataFrame(
        [(1, "https://a.b.Example.COM/x"), (2, "https://example.com/"),
         (3, "https://examplexcom.net/"), (4, "https://sub.bad.org/y"),
         (5, "notaurl"), (6, "https://good.com/z")],
        "doc_id long, url string")
    out = C.filter_blocklisted(urls, bl)
    assert sorted(r["doc_id"] for r in out.collect()) == [3, 5, 6]
    assert out.columns == ["doc_id", "url"]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_image_dhash_and_near_dup(spark):
    """dHash: decode->luma->block-mean->gradient; identical rasters hash
    equal through different PNG encodings (filters/interlace), a lightly
    perturbed copy lands within hamming<=4, a different pattern far
    away; image_near_dup finds exactly the planted pairs via the banded
    pigeonhole join; undecodable payloads keep a row (decode_ok=false)."""
    import numpy as np
    from wine_label_ocr_spark.operators.multimodal import (
        dhash64_raster, encode_png, image_dhash, image_near_dup)

    rng = np.random.default_rng(3)
    base = rng.integers(0, 256, (64, 72), dtype=np.uint8)
    near = base.copy()
    near[0:4, 0:4] ^= 3            # tiny local perturbation
    far = rng.integers(0, 256, (64, 72), dtype=np.uint8)

    h_base = dhash64_raster(base[:, :, None])
    h_near = dhash64_raster(near[:, :, None])
    h_far = dhash64_raster(far[:, :, None])
    ham = lambda a, b: bin((a ^ b) & ((1 << 64) - 1)).count("1")  # noqa: E731
    assert ham(h_base, h_near) <= 4
    assert ham(h_base, h_far) > 10

    rows = [("a", encode_png(base)),
            ("b", encode_png(base, filters=[4, 3, 2, 1, 0], interlace=True)),
            ("c", encode_png(near)),
            ("d", encode_png(far)),
            ("junk", b"not a png")]
    df = spark.createDataFrame(rows, "url string, payload binary")
    hashed = image_dhash(df)
    got = {r["url"]: (r["dhash"], r["decode_ok"]) for r in hashed.collect()}
    assert got["a"] == (h_base, True)
    assert got["a"][0] == got["b"][0]      # encoding-invariant
    assert got["junk"] == (None, False)

    pairs = {(r["id_a"], r["id_b"]): r["hamming"]
             for r in image_near_dup(hashed, max_hamming=4).collect()}
    assert ("a", "b") in pairs and pairs[("a", "b")] == 0
    assert ("a", "c") in pairs and ("b", "c") in pairs
    assert not any("d" in p or "junk" in p for p in pairs)


def test_wav_codec_and_audio_features(spark):
    """WAV PCM roundtrip (mono + stereo), FFT dominant bin on exact-bin
    tones, truncation tolerance, and non-WAV rows kept with
    decode_ok=false."""
    import numpy as np
    from wine_label_ocr_spark.operators.multimodal import (
        audio_features, decode_wav, encode_wav)

    t = np.arange(2048)
    tone = lambda k: np.round(9000.0 * np.sin(2 * np.pi * k * t / 1024.0)) \
        .astype(np.int16)  # noqa: E731
    s = tone(40)
    wav = encode_wav(s, 8192)
    back = decode_wav(wav)
    assert back is not None and back[1] == 8192
    assert (back[0][:, 0] == s).all()

    rows = [("a", bytes(wav)), ("b", bytes(encode_wav(tone(100), 8192))),
            ("short", bytes(encode_wav(tone(40)[:500], 8192))),
            ("junk", b"RIFFxxxxWAVEnope")]
    df = spark.createDataFrame(rows, "url string, payload binary")
    got = {r["url"]: r for r in audio_features(df).collect()}
    assert got["a"]["dominant_bin"] == 40
    assert got["a"]["dominant_freq_mhz"] == 40 * 8000  # 320 Hz in mHz
    assert got["b"]["dominant_bin"] == 100
    assert got["short"]["decode_ok"] is False   # < n_fft samples
    assert got["junk"]["decode_ok"] is False
    assert len(got) == 4                         # no row vanishes


def test_resample_pcm_kernel():
    """Windowed-sinc PCM resampling: exact tone-bin preservation down,
    up, and at rational ratios; anti-aliasing above the target Nyquist;
    identity at equal rates; amplitude within 0.1%."""
    import numpy as np
    from wine_label_ocr_spark.operators.multimodal import resample_pcm

    t = np.arange(2048)
    tone = lambda k: np.round(9000.0 * np.sin(2 * np.pi * k * t / 1024.0)) \
        .astype(np.int16)  # noqa: E731

    def dom(x, n_fft):
        spec = np.abs(np.fft.rfft(x[:n_fft, 0].astype(np.float64)))
        spec[0] = 0.0
        return int(np.argmax(spec))

    s = tone(50)  # 400 Hz at 8192
    down = resample_pcm(s, 8192, 4096)
    assert down.shape == (1024, 1) and dom(down, 1024) == 100
    up = resample_pcm(s, 8192, 16384)
    assert up.shape[0] == 4096 and dom(up, 1024) == 25
    rational = resample_pcm(s, 8192, 3072)  # L=3, M=8
    assert rational.shape[0] == 2048 * 3 // 8
    assert dom(rational, 512) == 67  # 400 Hz ≈ bin 66.67 at (3072, 512)
    # amplitude preserved in the passband
    assert abs(np.max(np.abs(down)) / 9000.0 - 1.0) < 1e-3

    alias = resample_pcm(tone(400), 8192, 4096)  # 3200 Hz > 2048 Nyquist
    rms = lambda x: np.sqrt(np.mean(x.astype(np.float64) ** 2))  # noqa: E731
    assert rms(alias) < 0.02 * rms(tone(400))  # stopband, not folded

    same = resample_pcm(s, 8192, 8192)
    assert (same[:, 0] == s).all()
    # stereo shape preserved
    st = resample_pcm(np.stack([s, -s], axis=1), 8192, 4096)
    assert st.shape == (1024, 2)


def test_resample_audio_operator(spark):
    """resample_audio re-encodes playable WAVs at the target rate; the
    FFT path over the RESAMPLED bytes finds the same physical frequency;
    junk rows survive with decode_ok=false; plan is a pure map."""
    import numpy as np
    from wine_label_ocr_spark.operators.multimodal import (
        audio_features, encode_wav, resample_audio)

    t = np.arange(2048)
    tone = lambda k: np.round(9000.0 * np.sin(2 * np.pi * k * t / 1024.0)) \
        .astype(np.int16)  # noqa: E731
    rows = [("a", bytes(encode_wav(tone(40), 8192))),
            ("junk", b"RIFFxxxxWAVEnope")]
    df = spark.createDataFrame(rows, "url string, payload binary")
    res = resample_audio(df, target_rate=4096)
    assert "Exchange" not in res._jdf.queryExecution() \
        .executedPlan().toString()
    got = {r["url"]: r for r in res.collect()}
    assert got["a"]["decode_ok"] and got["a"]["n_samples_out"] == 1024
    assert got["junk"]["decode_ok"] is False
    feats = {r["url"]: r for r in audio_features(
        res.filter("decode_ok")).collect()}
    # 320 Hz tone: bin 40 at (8192, 1024) → bin 80 at (4096, 1024)
    assert feats["a"]["dominant_bin"] == 80
    assert feats["a"]["dominant_freq_mhz"] == 40 * 8000  # same physical Hz


def test_stft_and_mel_filterbank():
    """Hann STFT: exact frame count, exact-bin tones dominate every
    frame; HTK-mel filterbank matches an independent reference
    construction and pools deterministically."""
    import numpy as np
    from wine_label_ocr_spark.operators.multimodal import (
        mel_filterbank, stft_frames)

    t = np.arange(2048)
    s = np.round(9000.0 * np.sin(2 * np.pi * 40 * t / 1024.0)) \
        .astype(np.int16)
    spec = stft_frames(s, 1024, 512)
    assert spec.shape == (3, 513)
    spec[:, 0] = 0.0
    assert (np.argmax(spec, axis=1) == 40).all()
    assert stft_frames(s[:1000], 1024, 512).shape == (0, 513)  # too short

    fb = mel_filterbank(20, 1024, 8192)
    assert fb.shape == (20, 513)
    # independent reference: band i peaks at the i+1'th mel-spaced edge
    mel = lambda f: 2595.0 * np.log10(1.0 + f / 700.0)  # noqa: E731
    edges = 700.0 * (10.0 ** (np.linspace(0, mel(4096.0), 22) / 2595.0) - 1)
    freqs = np.arange(513) * 8.0
    for i in (0, 9, 19):
        peak_bin = int(np.argmax(fb[i]))
        assert abs(freqs[peak_bin] - edges[i + 1]) <= 8.0  # within one bin
    # triangles partition: weights non-negative, rows non-empty
    assert (fb >= 0).all() and (fb.sum(axis=1) > 0).all()


def test_audio_spectrogram_operator(spark):
    """audio_spectrogram: per-frame dominant bins exact on planted
    tones, mel argmax stable across frames, junk rows kept, pure map."""
    import numpy as np
    from wine_label_ocr_spark.operators.multimodal import (
        audio_spectrogram, encode_wav)

    t = np.arange(2048)
    tone = lambda k: np.round(9000.0 * np.sin(2 * np.pi * k * t / 1024.0)) \
        .astype(np.int16)  # noqa: E731
    rows = [("a", bytes(encode_wav(tone(40), 8192))),
            ("b", bytes(encode_wav(tone(90), 8192))),
            ("junk", b"RIFFxxxxWAVEnope")]
    df = spark.createDataFrame(rows, "url string, payload binary")
    res = audio_spectrogram(df, n_fft=1024, hop=512, n_mels=20)
    assert "Exchange" not in res._jdf.queryExecution() \
        .executedPlan().toString()
    got = {r["url"]: r for r in res.collect()}
    assert got["a"]["n_frames"] == 3
    assert list(got["a"]["dominant_bins"]) == [40, 40, 40]
    assert list(got["b"]["dominant_bins"]) == [90, 90, 90]
    assert len(set(got["a"]["dominant_mels"])) == 1
    assert got["a"]["dominant_mels"][0] < got["b"]["dominant_mels"][0]
    assert got["junk"]["decode_ok"] is False


def test_audio_content_dedup(spark):
    """Byte-different re-encodings of the same recording collapse to
    one spectral-fingerprint group; different recordings don't."""
    import numpy as np
    from wine_label_ocr_spark.operators.multimodal import (
        audio_content_dedup, encode_wav)

    t = np.arange(2048)
    tone = lambda k: np.round(9000.0 * np.sin(2 * np.pi * k * t / 1024.0)) \
        .astype(np.int16)  # noqa: E731
    same = tone(40)
    padded = np.concatenate([same, np.zeros(100, np.int16)])  # byte-diff copy
    rows = [("a", bytes(encode_wav(same, 8192))),
            ("b", bytes(encode_wav(padded, 8192))),
            ("c", bytes(encode_wav(tone(60), 8192))),
            ("junk", b"nope")]
    df = spark.createDataFrame(rows, "url string, payload binary")
    got = {r["canonical_id"]: r for r in audio_content_dedup(df).collect()}
    assert list(got["a"]["members"]) == ["a", "b"] and got["a"]["n_dups"] == 2
    assert list(got["c"]["members"]) == ["c"]
    assert "junk" not in got


# ---- statistical lang-id head (NB over hashed char n-grams) ----

LANG_SEED = [
    ("en", "the quick brown fox jumps over the lazy dog and runs away"),
    ("en", "she was not there when they looked for the right answer"),
    ("en", "every morning brings another chance to think things through"),
    ("de", "der schnelle braune fuchs springt über den faulen hund weg"),
    ("de", "sie war nicht dort als sie nach der richtigen antwort suchten"),
    ("de", "jeden morgen gibt es eine neue gelegenheit nachzudenken"),
    ("fr", "le renard brun rapide saute par dessus le chien paresseux"),
    ("fr", "elle n'était pas là quand ils cherchaient la bonne réponse"),
    ("fr", "chaque matin apporte une nouvelle occasion de réfléchir"),
    ("es", "el rápido zorro marrón salta sobre el perro perezoso"),
    ("es", "ella no estaba allí cuando buscaron la respuesta correcta"),
    ("es", "cada mañana trae una nueva oportunidad para reflexionar"),
    ("fr", "où est la gare et où sont les toilettes dans cette ville"),
    ("fr", "je voudrais savoir quelle heure il est maintenant s il te plaît"),
    ("en", "could you tell me what time it is right now please"),
    ("de", "können sie mir bitte sagen wie spät es jetzt ist"),
    ("es", "puede decirme qué hora es ahora mismo por favor"),
]


def _ref_lang_nb(texts, seed, n_min=2, n_max=3, n_buckets=1 << 18,
                 max_chars=192):
    """Independent single-process NB reference (md5 bucket flavor)."""
    import hashlib
    import math
    import re

    def grams(text):
        s = re.sub(r"\s+", " ", text.lower()).strip()[:max_chars]
        out = []
        for n in range(n_min, n_max + 1):
            out += [s[i:i + n] for i in range(len(s) - n + 1)]
        return out

    def bucket(g):
        h = int(hashlib.md5((g + "#0").encode("utf-8")).hexdigest()[:15], 16)
        return h % n_buckets

    cnt, tot = {}, Counter()
    for lang, t in seed:
        for g in grams(t):
            b = bucket(g)
            cnt[(lang, b)] = cnt.get((lang, b), 0) + 1
            tot[lang] += 1
    v = len({b for (_, b) in cnt})
    langs = sorted(tot)
    unk = {l: round(math.log(1.0 / (tot[l] + v)) * 1e6) for l in langs}
    results = []
    for t in texts:
        gs = [bucket(g) for g in grams(t)]
        if not gs:
            results.append((None, 0, 0))
            continue
        logits = {}
        for l in langs:
            s = sum(round(math.log(cnt.get((l, b), 0) + 1) * 1e6)
                    for b in gs)
            logits[l] = s + len(gs) * unk[l]
        ranked = sorted(logits.items(), key=lambda kv: (-kv[1], kv[0]))
        margin = (ranked[0][1] - ranked[1][1]) if len(ranked) > 1 else 0
        results.append((ranked[0][0], ranked[0][1], margin))
    return results


def test_lang_id_classifier_matches_reference(spark):
    """Exact integer logits/argmax/margin vs an independent NB
    implementation (md5 flavor), incl. the no-grams NULL case."""
    texts = ["wo ist der bahnhof bitte schön",
             "where is the train station please",
             "où est la gare s'il vous plaît",
             "dónde está la estación de tren por favor",
             "", "a"]
    seed = spark.createDataFrame(LANG_SEED, "lang string, text string")
    df = spark.createDataFrame(list(enumerate(texts)),
                               "doc_id long, text string")
    out = {r["doc_id"]: (r["lang"], r["logit_scaled"], r["margin_scaled"])
           for r in C.lang_id_classifier(df, seed,
                                         oracle_safe=True).collect()}
    want = _ref_lang_nb(texts, LANG_SEED)
    for i, w in enumerate(want):
        assert out[i] == w, (i, texts[i], out[i], w)
    assert [out[i][0] for i in range(4)] == ["de", "en", "fr", "es"]
    assert out[4][0] is None and out[5][0] is None  # sub-bigram texts


def test_lang_id_model_beats_marker_heuristic(spark):
    """The r8 VERDICT #3 bar: on function-word-free text the marker
    heuristic has no signal (its markers are function words) while the
    char-gram NB head still classifies correctly — morphology carries
    the n-grams."""
    from wine_label_ocr_spark.operators.textops import lang_id
    hard = [
        (0, "de", "schadenfreude kindergarten zeitgeist doppelgänger"),
        (1, "de", "fernweh weltschmerz schmetterling geschwindigkeit"),
        (2, "en", "weatherproofing thoroughbred knighthood throughput"),
        (3, "fr", "château grenouille écureuil chevalier papillon"),
        (4, "es", "ñoño añoranza cigüeña muñeca jalapeño zarzuela"),
    ]
    seed = spark.createDataFrame(LANG_SEED, "lang string, text string")
    df = spark.createDataFrame(hard, "doc_id long, want string, text string")
    nb = {r["doc_id"]: r["lang"]
          for r in C.lang_id_classifier(df, seed,
                                        oracle_safe=True).collect()}
    marker = {r["doc_id"]: r["m"]
              for r in df.select("doc_id",
                                 lang_id(F.col("text")).alias("m"))
              .collect()}
    nb_hits = sum(nb[i] == w for i, w, _ in hard)
    marker_hits = sum(marker[i] == w for i, w, _ in hard)
    assert nb_hits == len(hard), (nb, marker)
    assert nb_hits > marker_hits  # markers can't see function-word-free text


def test_lang_id_classifier_production_flavor_and_plan(spark):
    """xxhash64 flavor agrees with md5 flavor on argmax (bucket ids
    differ, the statistics don't); the scoring plan broadcasts the
    weights and never row-explodes per language (per-lang sums are
    columns, one doc-keyed agg)."""
    texts = ["the cat sat on the mat with the hat",
             "der hund lief durch den wald und über die wiese"]
    seed = spark.createDataFrame(LANG_SEED, "lang string, text string")
    df = spark.createDataFrame(list(enumerate(texts)),
                               "doc_id long, text string")
    prod = C.lang_id_classifier(df, seed, oracle_safe=False)
    got = {r["doc_id"]: r["lang"] for r in prod.collect()}
    assert got == {0: "en", 1: "de"}
    plan = prod._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan

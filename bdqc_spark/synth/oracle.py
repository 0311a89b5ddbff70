"""Single-node oracle — the executable spec of the reference
semantics (SURVEY.md §5.2 ring 3).

Pure numpy/pandas, no Spark: decodes every clip, profiles it, fits
EXACT per-cohort median/MAD, applies the same frozen rule thresholds
(bdqc_spark.plans.rules) and the same frozen scrub chain, and emits
`clips_golden` (FIXTURES.md §2). The Spark pipeline must match its
keep/drop at F1≥0.99 and its scrubbed transcript exactly
(BASELINE.json:2). Shared leaf functions (codecs, langid, ppl,
scrub) are imported from the same modules the Spark UDFs use — the
leaf math IS the spec; what this oracle independently re-derives is
the *dataflow* (profile → exact robust stats → rules), which is what
the distributed engine could get wrong.
"""

from __future__ import annotations

import hashlib
import itertools
import re

import numpy as np
import pandas as pd

from bdqc_spark.functions import audio
from bdqc_spark.functions.langid import predict_batch
from bdqc_spark.functions.lm import perplexity_batch
from bdqc_spark.functions.scrub import scrub_python
from bdqc_spark.plans import rules as R


def _text_stats(t: str) -> tuple[int, int, int]:
    """(n_tokens, max_run, n_chars) — mirrors functions/text.py."""
    toks = re.findall(r"[^ \t\n\r]+", t)
    max_run = 0
    for _, g in itertools.groupby(t):
        max_run = max(max_run, sum(1 for _ in g))
    return len(toks), max_run, len(t)


def oracle_labels(clips: pd.DataFrame) -> pd.DataFrame:
    """clips (pandas, incl. bytes) → clips_golden."""
    n = len(clips)
    pcm_ok = np.zeros(n, dtype=bool)
    dur_dec = np.zeros(n, dtype=np.int64)
    rms = np.zeros(n)
    clip_rate = np.zeros(n)
    hdr_sr = np.zeros(n, dtype=np.int64)
    sp_ratio = np.zeros(n)
    n_samples = np.zeros(n, dtype=np.int64)
    dc_off = np.zeros(n)
    bw = np.ones(n)  # 1.0 = full band / no evidence (engine default)
    pcm_sha = np.empty(n, dtype=object)
    for i, (raw, codec, sr) in enumerate(
        zip(clips["bytes"].to_numpy(object), clips["codec"], clips["sr_hz"])
    ):
        pcm_sha[i] = ""
        if raw is None or codec not in audio.CODECS or not sr or sr <= 0:
            continue
        try:
            pcm = audio.decode(bytes(raw), codec)
        except (ValueError, TypeError):
            continue
        pcm_ok[i] = True
        dur_dec[i] = int(round(len(pcm) * 1000.0 / sr))
        # IDENTICAL fused formula to the engine's profile stage
        # (plans/profile.py): float32 BLAS dot + count_nonzero, so
        # engine and oracle cannot drift even in the last float digits
        if len(pcm):
            rms[i] = float(np.sqrt(float(np.dot(pcm, pcm)) / len(pcm)))
            clip_rate[i] = (
                int(np.count_nonzero(pcm >= 0.999))
                + int(np.count_nonzero(pcm <= -0.999))
            ) / len(pcm)
            # shared VAD + bandwidth leaves — identical math to the engine
            sp_ratio[i] = audio.speech_ratio(pcm, int(sr))
            n_samples[i] = len(pcm)
            dc_off[i] = float(pcm.sum(dtype=np.float64)) / len(pcm)
            bw[i] = audio.bandwidth_ratio(pcm, int(sr))
        if codec == "wav":
            hdr_sr[i] = audio.wav_info(bytes(raw))["hdr_sr"]
        pcm_sha[i] = hashlib.sha256(np.ascontiguousarray(pcm).tobytes()).hexdigest()

    lang = predict_batch(clips["transcript"])
    ppl = perplexity_batch(clips["transcript"])
    stats = [_text_stats(t if isinstance(t, str) else "") for t in clips["transcript"]]
    n_tokens = np.array([s[0] for s in stats])
    max_run = np.array([s[1] for s in stats])
    n_chars = np.array([s[2] for s in stats])

    df = pd.DataFrame(
        {
            "clip_id": clips["clip_id"].to_numpy(),
            "codec": clips["codec"].to_numpy(),
            "sr_hz": clips["sr_hz"].to_numpy(),
            "dur_ms": clips["dur_ms"].to_numpy(),
            "transcript": clips["transcript"].to_numpy(),
            "lang_pred": lang["pred"].to_numpy(),
            "conf": lang["conf"].to_numpy(),
            "ppl": ppl,
            "pcm_ok": pcm_ok,
            "dur_ms_decoded": dur_dec,
            "rms": rms,
            "clip_rate": clip_rate,
            "hdr_sr": hdr_sr,
            "speech_ratio": sp_ratio,
            "n_samples": n_samples,
            "dc_off": dc_off,
            "bw_ratio": bw,
            "n_tokens": n_tokens,
            "max_run": max_run,
            "n_chars": n_chars,
            "pcm_sha256": pcm_sha,
        }
    )

    hits: list[list[str]] = [[] for _ in range(n)]

    def add(mask: np.ndarray, rule_id: str) -> None:
        for i in np.flatnonzero(np.asarray(mask)):
            hits[i].append(rule_id)

    # Exact per-cohort robust stats, one deviation rule per modeled
    # attribute (mirrors plans/rules.py DEVIATION_RULES + decide.py):
    # fit on finite values only, score every row (inf → z = inf),
    # fire only with MIN_COHORT_N support in the fitted population.
    with np.errstate(divide="ignore", invalid="ignore"):
        log_ppl = np.log(df["ppl"].to_numpy(dtype=float))
    # Cross-modal speech-rate axis — IDENTICAL float64 formula and
    # operand order to the engine's models.log_cps_column: rows
    # without evidence (decode failure, < CPS_MIN_DUR_MS, no detected
    # speech, empty transcript) are NaN — excluded from the fit and
    # never fired on (NaN > threshold is False).
    speech_sec = sp_ratio * dur_dec / 1000.0
    cps_ok = pcm_ok & (dur_dec >= R.CPS_MIN_DUR_MS) & (speech_sec > 0) & (n_chars > 0)
    with np.errstate(divide="ignore", invalid="ignore"):
        log_cps = np.where(
            cps_ok, np.log(n_chars / np.where(speech_sec > 0, speech_sec, 1.0)), np.nan
        )
    attr_vals = {
        "dur_ms": df["dur_ms"].to_numpy(dtype=float),
        "log_cps": log_cps,
        "log_ppl": log_ppl,
        "rms": df["rms"].to_numpy(dtype=float),
        "n_tokens": df["n_tokens"].to_numpy(dtype=float),
    }
    cohort = ["codec", "lang_pred"]
    for rule in R.DEVIATION_RULES:
        tmp = pd.DataFrame(
            {"codec": df["codec"], "lang_pred": df["lang_pred"], "v": attr_vals[rule.attribute]}
        )
        fin = tmp[np.isfinite(tmp["v"])]
        stats = fin.groupby(cohort)["v"].agg(median="median", n="count")
        fin = fin.merge(stats, left_on=cohort, right_index=True)
        stats["mad"] = (fin["v"] - fin["median"]).abs().groupby(
            [fin["codec"], fin["lang_pred"]]
        ).median()
        # Every row joins its cohort's model (like the engine's
        # broadcast join) — a row with v = inf still scores z = inf.
        j = tmp.merge(stats, left_on=cohort, right_index=True, how="left")
        v, med = j["v"].to_numpy(), j["median"].to_numpy()
        mad, cn = j["mad"].to_numpy(), j["n"].fillna(0).to_numpy()
        with np.errstate(divide="ignore", invalid="ignore"):
            z = np.where(
                mad > 0,
                np.abs(v - med) / (1.4826 * mad),
                np.where(v == med, 0.0, np.inf),
            )
        fire = ~np.isnan(med) & (cn >= R.MIN_COHORT_N) & (z > rule.z_threshold)
        add(fire, rule.rule_id)

    # Categorical rare-value rules (plans/rules.py CATEGORICAL_RULES):
    # within-cohort value frequency below rare_frac → flagged.
    cat_vals = {"sr_hz": df["sr_hz"].astype(str)}
    for rule in R.CATEGORICAL_RULES:
        val = cat_vals[rule.attribute]
        key = [df["codec"], df["lang_pred"]]
        cohort_n = val.groupby(key).transform("count")
        val_n = val.groupby(key + [val]).transform("count")
        fire = (cohort_n >= R.MIN_COHORT_N) & (val_n / cohort_n < rule.rare_frac)
        add(fire.to_numpy(), rule.rule_id)

    add(~df["pcm_ok"], "audio.decode_failed")
    add(
        df["pcm_ok"]
        & (
            (df["dur_ms"] - df["dur_ms_decoded"]).abs()
            > np.maximum(R.DUR_MISMATCH_MS, 0.1 * df["dur_ms"])
        ),
        "audio.dur_mismatch",
    )
    add(df["pcm_ok"] & (df["rms"] < R.RMS_SILENT), "audio.silent")
    add(df["pcm_ok"] & (df["clip_rate"] > R.CLIP_RATE_MAX), "audio.clipping")
    add(
        df["pcm_ok"] & (df["hdr_sr"] > 0) & (df["hdr_sr"] != df["sr_hz"]),
        "audio.hdr_sr_mismatch",
    )
    add(
        df["pcm_ok"]
        & (df["dur_ms_decoded"] >= R.MIN_SPEECH_DUR_MS)
        & (df["speech_ratio"] < R.SPEECH_RATIO_MIN),
        "audio.low_speech",
    )
    add(
        df["pcm_ok"]
        & (df["n_samples"] >= R.BW_MIN_SAMPLES)
        & (df["bw_ratio"] < R.BW_RATIO_MIN),
        "audio.bandwidth_low",
    )
    add(df["pcm_ok"] & (df["dc_off"].abs() > R.DC_OFF_MAX), "audio.dc_offset")
    add(~df["sr_hz"].isin(R.VALID_SR), "meta.sr_invalid")
    add(df["n_tokens"] == 0, "text.empty")
    add(df["ppl"] > R.PPL_MAX, "text.high_ppl")
    add((df["n_tokens"] > 0) & (df["conf"] < R.CONF_MIN), "text.lang_conf_low")
    add(df["max_run"] >= R.MAX_RUN, "text.max_run")

    keep = np.array([len(h) == 0 for h in hits])
    scrubbed = np.empty(n, dtype=object)
    for i in range(n):
        if keep[i]:
            t = df["transcript"].iloc[i]
            scrubbed[i], _, _ = scrub_python(t if isinstance(t, str) else "")
        else:
            scrubbed[i] = None

    out = pd.DataFrame(
        {
            "clip_id": df["clip_id"],
            "keep": keep,
            "rule_hits": [sorted(h) for h in hits],
            "scrubbed_transcript": scrubbed,
            "pcm_sha256": df["pcm_sha256"],
        }
    )
    if "lang_true" in clips.columns:
        out["lang_true"] = clips["lang_true"].to_numpy()
    return out

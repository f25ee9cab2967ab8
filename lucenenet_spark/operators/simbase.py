"""SimilarityBase component matrix: DFR and IB similarities as composable
(basic model | distribution) x (after-effect | lambda) x (normalization)
kernels, float32-exact vs the reference.

Reference semantics (Lucene.Net 4.8):
  SimilarityBase.cs:117-139 - avgFieldLength = f32(f32(numberOfFieldTokens)
    / numberOfDocuments), or 1 when the field reports no tokens;
    Log2(x) = ln(x)/ln(2) computed in double.
  DFRSimilarity.cs:121-125 - score = f32(f32(totalBoost * BM(stats, tfn))
    * AE(stats, tfn)) with tfn = Normalization.Tfn(stats, freq, docLen).
  IBSimilarity.cs:90-93   - score = f32(totalBoost * Dist(stats, tfn,
    Lambda(stats))).

Components (each cites its .cs and keeps its exact float/double op chain):
  basic models  be BasicModelBE.cs:48-66 | d BasicModelD.cs:45-56
                g BasicModelG.cs:37-45   | if BasicModelIF.cs:35-40
                in BasicModelIn.cs:35-40 | ine BasicModelIne.cs:35-41
                p BasicModelP.cs:43-48
  after-effects no AfterEffect.cs:50-61 (1f) | b AfterEffectB.cs:33-38
                l AfterEffectL.cs:32-35
  normalizations no Normalization.cs:62-73 (tfn = tf)
                h1 NormalizationH1.cs:52-55 (c unused in 4.8's Tfn)
                h2 NormalizationH2.cs:53-56 (c = 1)
                h3 NormalizationH3.cs:46-49 (mu = 800)
                z  NormalizationZ.cs:49-52  (z = 0.30)
  distributions ll DistributionLL.cs:37-40 | spl DistributionSPL.cs:33-43
  lambdas       df LambdaDF.cs:36-39 | ttf LambdaTTF.cs:36-39

Similarity names accept either a shorthand alias (dfr_gb2, ib_ll, ...) or a
full spec string "dfr:<basic>:<ae>:<norm>" / "ib:<dist>:<lambda>:<norm>",
e.g. "dfr:be:b:h2" is Lucene's BB2 model.

Kernels are numpy-vectorized over a decoded posting block (freq and docLen
arrays); all stats are per-(field, term) scalars, so one term's whole block
scores in a handful of SIMD passes - no per-document Python.
"""

from __future__ import annotations

import numpy as np

LN2 = float(np.log(2.0))

H3_MU = np.float32(800.0)  # NormalizationH3.cs:31 default
Z_Z = np.float32(0.30)  # NormalizationZ.cs:34 default

BASIC_MODELS = ("be", "d", "g", "if", "in", "ine", "p")
AFTER_EFFECTS = ("no", "b", "l")
NORMALIZATIONS = ("no", "h1", "h2", "h3", "z")
DISTRIBUTIONS = ("ll", "spl")
LAMBDAS = ("df", "ttf")

# Lucene's conventional names for common combinations
ALIASES = {
    "dfr_gb2": "dfr:g:b:h2",
    "dfr_pl2": "dfr:p:l:h2",
    "dfr_inb2": "dfr:in:b:h2",
    "dfr_ineb2": "dfr:ine:b:h2",
    "dfr_bb2": "dfr:be:b:h2",
    "dfr_db2": "dfr:d:b:h2",
    "dfr_ifb2": "dfr:if:b:h2",
    "dfr_inl2": "dfr:in:l:h2",
    "ib_ll": "ib:ll:df:h2",
    "ib_spl": "ib:spl:df:h2",
    "ib_ll_ttf": "ib:ll:ttf:h2",
}


def parse_spec(name: str):
    """Resolve a similarity name to a component tuple, or None if the name
    is not a SimilarityBase family member.

    Returns ("dfr", basic, ae, norm) or ("ib", dist, lambda, norm)."""
    name = ALIASES.get(name, name)
    parts = tuple(name.split(":"))
    if (
        len(parts) == 4
        and parts[0] == "dfr"
        and parts[1] in BASIC_MODELS
        and parts[2] in AFTER_EFFECTS
        and parts[3] in NORMALIZATIONS
    ):
        return parts
    if (
        len(parts) == 4
        and parts[0] == "ib"
        and parts[1] in DISTRIBUTIONS
        and parts[2] in LAMBDAS
        and parts[3] in NORMALIZATIONS
    ):
        return parts
    return None


def make_stats(n_docs: int, df: int, ttf: int, nft: int) -> dict:
    """Per-(field, term) BasicStats: numberOfDocuments, docFreq,
    totalTermFreq, numberOfFieldTokens, and the derived float32
    avgFieldLength (SimilarityBase.cs:117-139; avg = 1 when nft <= 0)."""
    avg = (
        np.float32(np.float32(nft) / np.float32(n_docs))
        if nft > 0
        else np.float32(1.0)
    )
    return {"N": int(n_docs), "df": int(df), "ttf": int(ttf), "nft": int(nft), "avg32": avg}


def tfn_vec(norm: str, freq: np.ndarray, dl: np.ndarray, st: dict) -> np.ndarray:
    """Normalization.Tfn over a block: freq/dl float32 arrays -> float32 tfn.

    no: tf (Normalization.NoNormalization).
    h1: f32(f32(tf * avg) / len) - 4.8's H1.Tfn ignores its c parameter.
    h2: f32(f64(tf) * log2(f64(f32(1 + f32(f32(c*avg)/len))))) with c=1.
    h3: f32(f32(f32(tf + f32(mu * f32(f32(ttf+1f)/f32(nft+1f)))) /
        f32(len + mu)) * mu), mu=800 - all-float32 left-to-right chain.
    z:  f32(f64(tf) * pow(f64(f32(avg/len)), f64(z))), z=0.30f."""
    if norm == "no":
        return freq
    avg = st["avg32"]
    if norm == "h1":
        return (freq * avg) / dl
    if norm == "h2":
        inner = np.float32(1.0) + (np.float32(np.float32(1.0) * avg) / dl)
        return (
            freq.astype(np.float64) * (np.log(inner.astype(np.float64)) / LN2)
        ).astype(np.float32)
    if norm == "h3":
        r = np.float32(
            (np.float32(st["ttf"]) + np.float32(1.0))
            / (np.float32(st["nft"]) + np.float32(1.0))
        )
        a = np.float32(H3_MU * r)
        return ((freq + a) / (dl + H3_MU)) * H3_MU
    # z
    ratio = avg / dl  # float32
    return (
        freq.astype(np.float64)
        * np.power(ratio.astype(np.float64), np.float64(Z_Z))
    ).astype(np.float32)


def _log2(x):
    return np.log(x) / LN2


def basic_vec(bm: str, st: dict, tfn: np.ndarray) -> np.ndarray:
    """BasicModel.Score over a block (float32 tfn array -> float32 BM)."""
    N = float(st["N"])
    df = st["df"]
    ttf = st["ttf"]
    t64 = tfn.astype(np.float64)
    if bm == "be":
        # BasicModelBE.cs:48-66 - everything in double; helper
        # f(n, m) = (m+0.5)*log2(n/m) + (n-m)*log2(n)
        F = float(ttf) + 1.0 + t64
        Nn = F + N

        def fhelp(n, m):
            return (m + 0.5) * _log2(n / m) + (n - m) * _log2(n)

        res = (
            -_log2((Nn - 1.0) * np.e)
            + fhelp(Nn + F - 1.0, Nn + F - t64 - 2.0)
            - fhelp(F, F - t64)
        )
        return res.astype(np.float32)
    if bm == "d":
        # BasicModelD.cs:45-56 - double; F normalized by +tfn to keep phi<1
        F = float(ttf) + 1.0 + t64
        phi = t64 / F
        nphi = 1.0 - phi
        p = 1.0 / (N + 1.0)
        D = phi * _log2(phi / p) + nphi * _log2(nphi / (1.0 - p))
        return (D * F + 0.5 * _log2(1.0 + 2.0 * np.pi * t64 * nphi)).astype(
            np.float32
        )
    if bm == "g":
        # BasicModelG.cs:37-45 - lambda and both log2 terms in double
        Fv = float(ttf + 1)
        lam = Fv / (N + Fv)
        return (_log2(lam + 1.0) + t64 * _log2((1.0 + lam) / lam)).astype(
            np.float32
        )
    if bm == "if":
        # BasicModelIF.cs:35-40 - log2 in double, cast f32, THEN f32 multiply
        l2 = np.float32(_log2(1.0 + (N + 1.0) / (float(ttf) + 0.5)))
        return tfn * l2
    if bm == "in":
        # BasicModelIn.cs:35-40
        l2 = np.float32(_log2((N + 1.0) / (float(df) + 0.5)))
        return tfn * l2
    if bm == "ine":
        # BasicModelIne.cs:35-41 - ne in double replaces df
        ne = N * (1.0 - ((N - 1.0) / N) ** float(ttf))
        l2 = np.float32(_log2((N + 1.0) / (ne + 0.5)))
        return tfn * l2
    # p - BasicModelP.cs:43-48: lambda f32; the three addends in double
    # (the middle one from an all-float32 inner chain), summed in double,
    # cast f32
    lam = np.float32(np.float32(ttf + 1) / np.float32(st["N"] + 1))
    term1 = t64 * _log2((tfn / lam).astype(np.float64))
    mid = (lam + (np.float32(1.0) / (np.float32(12.0) * tfn))) - tfn
    term2 = mid.astype(np.float64) * (1.0 / LN2)  # * LOG2_E
    term3 = 0.5 * _log2(2.0 * np.pi * t64)
    return (term1 + term2 + term3).astype(np.float32)


def ae_vec(ae: str, st: dict, tfn: np.ndarray):
    """AfterEffect.Score: 1f | B: long (ttf+2) / f32(f32(df+1) * f32(tfn+1))
    | L: f32(1 / f32(tfn+1))."""
    if ae == "no":
        return np.float32(1.0)
    if ae == "b":
        return np.float32(st["ttf"] + 2) / (
            np.float32(st["df"] + 1) * (tfn + np.float32(1.0))
        )
    return np.float32(1.0) / (tfn + np.float32(1.0))


def ib_lambda(lam: str, st: dict) -> np.float32:
    """LambdaDF: f32(f32(df + 1f) / f32(N + 1f)); LambdaTTF: same with ttf."""
    num = st["df"] if lam == "df" else st["ttf"]
    return np.float32(
        (np.float32(num) + np.float32(1.0))
        / (np.float32(st["N"]) + np.float32(1.0))
    )


def dist_vec(dist: str, tfn: np.ndarray, lam: np.float32) -> np.ndarray:
    """Distribution.Score over a block.

    ll:  f32(-ln(f64(f32(lam / f32(tfn + lam))))).
    spl: lam clamped to 0.99f at exactly 1; f32(-ln((lam^f32(tfn/f32(tfn+1))
         - lam) / f64(f32(1 - lam)))) with pow/sub/div in double."""
    if dist == "ll":
        ratio = lam / (tfn + lam)
        return (-np.log(ratio.astype(np.float64))).astype(np.float32)
    # spl
    if lam == np.float32(1.0):
        lam = np.float32(0.99)
    expo = tfn / (tfn + np.float32(1.0))
    num = np.power(np.float64(lam), expo.astype(np.float64)) - np.float64(lam)
    den = np.float64(np.float32(1.0) - lam)
    return (-np.log(num / den)).astype(np.float32)


def block_scores(
    spec: tuple, st: dict, boost: float, freq: np.ndarray, dl: np.ndarray
) -> np.ndarray:
    """Score one decoded posting block under a parsed spec. freq/dl are
    float32 arrays (dl = decoded byte315^-2 length, or 1 for omitNorms)."""
    family = spec[0]
    tfn = tfn_vec(spec[3], freq, dl, st)
    if family == "dfr":
        bmv = basic_vec(spec[1], st, tfn)
        aev = ae_vec(spec[2], st, tfn)
        return (np.float32(boost) * bmv) * aev
    lam = ib_lambda(spec[2], st)
    dv = dist_vec(spec[1], tfn, lam)
    return np.float32(boost) * dv

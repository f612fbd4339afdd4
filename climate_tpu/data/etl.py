"""ETL: Zarr arrays -> stacked (time, channel, y, x) host arrays + splits.

Re-implements the reference's three ingestion variants with one parameterized
path (reference: main_baseline.py:75-129 single-member; main_ensemble.py:75-123
and main_final.py:238-274 multi-member with members concatenated on the time
axis), including every split quirk documented in SURVEY.md section 2.6:

- baseline:  val = last 120 months of ssp370 (target member), train gets the
  rest (main_baseline.py:177-200); test = last `test_months` of test_ssp.
- ensemble:  val_months=1080 removed from the 3-member ssp370 time-concat for
  training, but val itself is re-loaded as member 2 only, last 1080 of a
  1021-month array => all 1021 months (main_ensemble.py:203-211); test is
  member 0 only (main_ensemble.py:235-242).
- final:     val = last 1080 rows of the 3-member ssp370 concat (member 2 full
  + tail of member 1, main_final.py:333-338); test slice is taken from the
  member-concat => last 360 rows of member 2 (main_final.py:458-460).

Seasonal sin/cos month channels are a first-class option here (the reference
ships them only in a commented-out block, main_final.py:186-216, yet hardcodes
in_ch=7 at the model factory, src/models.py:26 — SURVEY.md 2.6.1). Same for
the tas<150K placeholder masking (main_final.py:228-230, commented out).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from .zarr import ZarrGroup

SEASONAL_VARS = ("sin_month", "cos_month")


@dataclass
class SplitArrays:
    inputs: np.ndarray  # (time, C_in, y, x)
    outputs: np.ndarray  # (time, C_out, y, x)

    @property
    def n(self) -> int:
        return self.inputs.shape[0]


@dataclass
class DataBundle:
    train: SplitArrays
    val: SplitArrays
    test: SplitArrays  # outputs kept raw (un-normalized), reference parity
    lat: np.ndarray  # (y,) latitude values
    lon: np.ndarray  # (x,) longitude values
    input_vars: list[str] = field(default_factory=list)  # incl. seasonal channels
    output_vars: list[str] = field(default_factory=list)


def _coord_index(group: ZarrGroup, coord: str, value) -> int:
    vals = group.read(coord)
    matches = np.nonzero(vals == value)[0]
    if len(matches) == 0:
        raise KeyError(f"{value!r} not found in coordinate {coord!r} ({vals!r})")
    return int(matches[0])


def month_index(group: ZarrGroup) -> np.ndarray:
    """0-based month-of-year per timestep, derived from the time coordinate.

    The store's time axis is monthly from 2015-01 (units in time/.zattrs);
    equivalent to the reference's `time_coord.dt.month - 1`
    (main_final.py:188).
    """
    t = np.asarray(group.read("time"), dtype=np.int64)
    attrs = group.meta("time").attrs
    units = attrs.get("units", "")
    calendar = attrs.get("calendar", "standard")
    if units.startswith("days since") and calendar in ("noleap", "365_day"):
        start = units.split()[2]  # YYYY-MM-DD
        _, m0, d0 = (int(p) for p in start.split("-"))
        mlens = np.array([31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31])
        cum = np.concatenate([[0], np.cumsum(mlens)])  # month start day-of-year
        doy = (t + cum[m0 - 1] + (d0 - 1)) % 365
        return np.searchsorted(cum, doy, side="right") - 1
    if units.startswith("days since"):
        # Assume strictly monthly cadence from the start month.
        m0 = int(units.split()[2].split("-")[1])
        return ((m0 - 1) + np.arange(len(t), dtype=np.int64)) % 12
    # Fallback: monthly series starting in January.
    return np.arange(len(t), dtype=np.int64) % 12


def _sanitize_global_series(x: np.ndarray, abs_threshold: float) -> np.ndarray:
    """Robust cleaning for global scalar forcings (CO2/CH4).

    The public store's corruption is bit-garbage in these two arrays only
    (spatial fields verified clean); magnitudes range from ~1e5 up to 1e304,
    so a fixed threshold misses the small-exponent garbage (observed: CH4
    -7.7e8 while the physical series sits in [0.1, 0.75]). Median/MAD flags
    anything further than 1000 robust sigmas from the series median -> NaN
    (skipped by nan-stats, zero-filled post-normalization).
    """
    x = np.asarray(x, dtype=np.float64)
    bad = ~np.isfinite(x) | (np.abs(x) > abs_threshold)
    finite = x[~bad]
    if finite.size:
        med = np.median(finite)
        mad = np.median(np.abs(finite - med))
        scale = max(mad * 1.4826, abs(med) * 1e-6, 1e-300)
        bad |= np.abs(x - med) > 1000.0 * scale
    return np.where(bad, np.nan, x)


def load_ssp_arrays(
    group: ZarrGroup,
    ssp: str,
    input_vars: list[str],
    output_vars: list[str],
    member_ids: list[int],
    add_seasonal: bool = False,
    mask_tas_below: float | None = None,
    sanitize_threshold: float | None = 1e10,
    feedback_vars: list[str] | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Inputs & outputs for all requested members, concatenated on time.

    Mirrors _load_process_ssp_data (main_final.py:238-274): per member, stack
    input channels (globals broadcast to the spatial grid) then concat the
    members along time, keeping chronology per member. Single-member call
    reproduces the baseline variant (main_baseline.py:75-129).

    feedback_vars: output variables appended as teacher-forced `prev_<var>`
    input channels — the previous month's TRUE output, clamped at the series
    start (prev[0] = out[0]; a physical value, not an unphysical zero). The
    shift happens per (ssp, member) BEFORE any time-axis concatenation, so
    prev channels never cross member or SSP boundaries (unlike the sliding
    windows, whose reference-quirk boundary crossing is reproduced —
    SURVEY.md 2.6.4). Enables true autoregression at rollout (eval/rollout.py).
    """
    ssp_idx = _coord_index(group, "ssp", ssp)
    months = month_index(group) if add_seasonal else None

    input_members, output_members = [], []
    for m in member_ids:
        chans = []
        for var in input_vars:
            meta = group.meta(var)
            dims = meta.dims
            arr = group.read(var)
            # select ssp
            arr = np.take(arr, ssp_idx, axis=dims.index("ssp"))
            rem = [d for d in dims if d != "ssp"]
            if "member_id" in rem:
                m_idx = _coord_index(group, "member_id", m)
                arr = np.take(arr, m_idx, axis=rem.index("member_id"))
                rem = [d for d in rem if d != "member_id"]
            if rem == ["time"]:
                # global scalar forcing: robust-clean the corrupted series
                # (see _sanitize_global_series), then broadcast spatially.
                # The reference's pervasive nan-stats (da.nanmean/nanstd,
                # main_baseline.py:211-214) imply corrupt points were NaN in
                # the original data — restore that semantics.
                if sanitize_threshold is not None:
                    arr = _sanitize_global_series(arr, sanitize_threshold)
                ny = group.meta("y").shape[0]
                nx = group.meta("x").shape[0]
                arr = np.broadcast_to(arr[:, None, None], (arr.shape[0], ny, nx))
            elif set(rem) not in ({"time", "y", "x"}, {"time", "latitude", "longitude"}):
                raise ValueError(f"Unexpected dims {dims} for {var}")
            arr = np.asarray(arr)
            if sanitize_threshold is not None:
                bad = np.abs(arr) > sanitize_threshold
                if bad.any():
                    arr = np.where(bad, np.nan, arr)
            chans.append(arr)
        if add_seasonal:
            ny = group.meta("y").shape[0]
            nx = group.meta("x").shape[0]
            sin_m = np.sin(2 * np.pi * months / 12.0)
            cos_m = np.cos(2 * np.pi * months / 12.0)
            chans.append(np.broadcast_to(sin_m[:, None, None], (len(months), ny, nx)))
            chans.append(np.broadcast_to(cos_m[:, None, None], (len(months), ny, nx)))

        out_chans = []
        for var in output_vars:
            meta = group.meta(var)
            dims = meta.dims
            arr = group.read(var)
            arr = np.take(arr, ssp_idx, axis=dims.index("ssp"))
            rem = [d for d in dims if d != "ssp"]
            if "member_id" in rem:
                m_idx = _coord_index(group, "member_id", m)
                arr = np.take(arr, m_idx, axis=rem.index("member_id"))
            arr = np.asarray(arr)
            if mask_tas_below is not None and var == "tas":
                # CMIP6 placeholder/missing values (reference main_final.py:228-230)
                arr = np.where(arr >= mask_tas_below, arr, np.nan)
            out_chans.append(arr)
        output_members.append(np.stack(out_chans, axis=1))

        for var in feedback_vars or []:
            if var not in output_vars:
                raise ValueError(f"feedback var {var!r} is not an output var {output_vars}")
            out = out_chans[output_vars.index(var)]
            # previous month's true output, start clamped: prev[0] = out[0]
            chans.append(np.concatenate([out[:1], out[:-1]], axis=0))
        input_members.append(np.stack(chans, axis=1))

    return (
        np.concatenate(input_members, axis=0),
        np.concatenate(output_members, axis=0),
    )


def prepare_databundle(
    group: ZarrGroup,
    *,
    pipeline: str,  # "baseline" | "ensemble" | "final"
    input_vars: list[str],
    output_vars: list[str],
    train_ssps: list[str],
    test_ssp: str,
    test_months: int = 360,
    target_member_id: int = 0,
    member_ids: list[int] | None = None,
    seasonal_embeddings: bool = False,
    mask_tas_below: float | None = None,
    sanitize_threshold: float | None = 1e10,
    val_ssp: str = "ssp370",
    val_months: int | None = None,
    feedback_vars: list[str] | None = None,
) -> DataBundle:
    """Load, stack and split — one path replacing the 3 reference mains."""
    if pipeline == "baseline":
        members = [target_member_id]
        val_months = 120 if val_months is None else val_months  # main_baseline.py:178
    elif pipeline in ("ensemble", "final"):
        members = list(member_ids if member_ids is not None else (0,))
        val_months = 1080 if val_months is None else val_months  # main_{ensemble,final}.py
    else:
        raise ValueError(f"Unknown pipeline: {pipeline!r}")

    def load(ssp, mems):
        return load_ssp_arrays(
            group, ssp, input_vars, output_vars, mems,
            add_seasonal=seasonal_embeddings, mask_tas_below=mask_tas_below,
            sanitize_threshold=sanitize_threshold, feedback_vars=feedback_vars,
        )

    train_in, train_out = [], []
    val_in = val_out = None
    for ssp in train_ssps:
        x, y = load(ssp, members)
        if ssp == val_ssp:
            val_in, val_out = x[-val_months:], y[-val_months:]
            if x.shape[0] > val_months:
                train_in.append(x[:-val_months])
                train_out.append(y[:-val_months])
        else:
            train_in.append(x)
            train_out.append(y)

    if pipeline == "ensemble":
        # member-2 validation patch (main_ensemble.py:203-211): re-load val as
        # member 2 only; [-1080:] of a 1021-month series = all 1021 months.
        v_in, v_out = load(val_ssp, [2])
        val_in, val_out = v_in[-val_months:], v_out[-val_months:]

    if not train_in:
        raise ValueError("No training data available. Check SSP configuration and val_months.")

    train = SplitArrays(np.concatenate(train_in, 0), np.concatenate(train_out, 0))
    val = SplitArrays(val_in, val_out)

    test_members = [target_member_id] if pipeline == "baseline" else ([0] if pipeline == "ensemble" else members)
    t_in, t_out = load(test_ssp, test_members)
    test = SplitArrays(t_in[-test_months:], t_out[-test_months:])

    in_names = (
        list(input_vars)
        + (list(SEASONAL_VARS) if seasonal_embeddings else [])
        + [f"prev_{v}" for v in (feedback_vars or [])]
    )
    return DataBundle(
        train=train,
        val=val,
        test=test,
        lat=np.asarray(group.read("y"), dtype=np.float64),
        lon=np.asarray(group.read("x"), dtype=np.float64),
        input_vars=in_names,
        output_vars=list(output_vars),
    )

"""Compare our PESQ implementations against the reference oracle binary
over a battery of degradations.  Development harness for parity iteration.

Run: python tools/pesq_oracle_battery.py [np|native]
"""

import ctypes
import sys

import numpy as np

_lib = ctypes.CDLL("/root/reference/PESQ.so")
_lib.pesq.restype = ctypes.c_double


def oracle(clean, deg):
    c = np.ascontiguousarray(clean, np.float64)
    d = np.ascontiguousarray(deg, np.float64)
    return _lib.pesq(
        ctypes.c_void_p(c.ctypes.data),
        ctypes.c_void_p(d.ctypes.data),
        ctypes.c_long(len(c)),
        ctypes.c_long(len(d)),
    )


def speechlike(rng, n=48000, fs=16000, f0=120.0):
    """Synthetic voiced 'speech': pitch harmonics with formant envelope +
    syllabic amplitude modulation + pauses."""
    t = np.arange(n) / fs
    harmonics = np.zeros(n)
    for k in range(1, 30):
        f = k * f0
        if f > 7000:
            break
        formant = (
            np.exp(-(((f - 500) / 300) ** 2))
            + 0.7 * np.exp(-(((f - 1500) / 400) ** 2))
            + 0.4 * np.exp(-(((f - 2500) / 500) ** 2))
        )
        harmonics += formant / k * np.sin(2 * np.pi * f * t + rng.uniform(0, 6))
    syllable = np.clip(np.sin(2 * np.pi * 4 * t + rng.uniform(0, 6)), 0, None)
    pauses = (np.sin(2 * np.pi * 0.7 * t) > -0.3).astype(float)
    x = harmonics * syllable * pauses
    x += 0.003 * rng.standard_normal(n)
    return 0.25 * x / np.max(np.abs(x))


def battery(rng):
    cases = []
    x = speechlike(rng)
    cases.append(("identical", x, x.copy()))
    cases.append(("gain_x2", x, 2 * x))
    for snr in (40, 30, 20, 10, 5, 0):
        noise = rng.standard_normal(len(x))
        noise *= np.sqrt(np.mean(x**2) / np.mean(noise**2) * 10 ** (-snr / 10))
        cases.append((f"awgn_{snr}dB", x, x + noise))
    # lowpass degradation
    from scipy.signal import butter, lfilter

    b, a = butter(4, 2000 / 8000)
    cases.append(("lowpass_2k", x, lfilter(b, a, x)))
    b, a = butter(4, 1000 / 8000)
    cases.append(("lowpass_1k", x, lfilter(b, a, x)))
    # clipping
    cases.append(("clip_50pct", x, np.clip(x, -0.5 * x.max(), 0.5 * x.max())))
    # amplitude modulation (gain variation)
    t = np.arange(len(x)) / 16000
    cases.append(("am_gain", x, x * (1 + 0.5 * np.sin(2 * np.pi * 1.0 * t))))
    # small delay
    d = np.zeros_like(x)
    d[320:] = x[:-320]
    cases.append(("delay_20ms", x, d))
    # second speaker-ish signal
    y = speechlike(rng, f0=200.0)
    cases.append(("different_signal", x, y))
    # real mild distortion: spectral subtraction artifacts emulation
    cases.append(("half_gain_noise", x, 0.5 * x + 0.01 * rng.standard_normal(len(x))))

    # --- time-shift battery (exercises the utterance alignment chain) ---
    noise = rng.standard_normal(len(x))
    noise *= np.sqrt(np.mean(x**2) / np.mean(noise**2) * 10 ** (-20 / 10))
    noisy = x + noise

    def shift(sig, k):
        out = np.zeros_like(sig)
        if k >= 0:
            out[k:] = sig[: len(sig) - k]
        else:
            out[:k] = sig[-k:]
        return out

    for ms in (10, 50, 200):
        k = ms * 16
        cases.append((f"shift_+{ms}ms_20dB", x, shift(noisy, k)))
        cases.append((f"shift_-{ms}ms_20dB", x, shift(noisy, -k)))

    # multi-utterance signal: bursts with long silence gaps
    seg = speechlike(rng, n=16000, f0=110.0)
    gap = np.zeros(12800)
    mx = np.concatenate([seg, gap, 0.8 * seg[::-1], gap, seg])
    mnoise = rng.standard_normal(len(mx))
    mnoise *= np.sqrt(
        np.mean(mx**2) / np.mean(mnoise**2) * 10 ** (-25 / 10)
    )
    mnoisy = mx + mnoise
    cases.append(("multi_utt_25dB", mx, mnoisy))
    cases.append(("multi_utt_shift_+30ms", mx, shift(mnoisy, 480)))

    # piecewise delay: delay changes mid-signal (split_align territory)
    half = len(mx) // 2
    pw = np.concatenate([shift(mnoisy[:half], 160), shift(mnoisy[half:], 800)])
    cases.append(("piecewise_delay", mx, pw))
    # decreasing delay: deg repeats content (P.862 frame amnesty territory)
    pw2 = np.concatenate([shift(mnoisy[:half], 800), shift(mnoisy[half:], 160)])
    cases.append(("piecewise_delay_rev", mx, pw2))
    return cases


def main():
    impl = sys.argv[1] if len(sys.argv) > 1 else "np"
    if impl == "np":
        from se_tpu.eval.pesq_np import pesq_wb_np as mine
    else:
        from se_tpu.eval.pesq_native import pesq as _p

        def mine(c, d):
            return _p(c, d, 16000)

    rng = np.random.default_rng(7)
    errs = []
    for name, c, d in battery(rng):
        o = oracle(c, d)
        m = mine(c, d)
        err = m - o
        errs.append(abs(err))
        print(f"{name:18s} oracle={o:7.4f} mine={m:7.4f} diff={err:+8.4f}")
    print(f"\nmax |diff| = {max(errs):.4f}, mean = {np.mean(errs):.4f}")


if __name__ == "__main__":
    main()

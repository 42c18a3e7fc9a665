"""Introspect the oracle PESQ binary's internal alignment decisions.

Calls /root/reference/PESQ.so's exported pesq_measure via ctypes with
reconstructed SIGNAL_INFO/ERROR_INFO layouts (recovered from the binary's
disassembly: UttSearch_Start@0x28, UttSearch_End@0x1b8, Utt_DelayEst@0x348,
Utt_Delay@0x4d8, Utt_DelayConf@0x668 (float), Utt_Start@0x730,
Utt_End@0x8c0, pesq_mos@0xa50, mapped_mos@0xa54) and dumps the utterance
table — ground truth for developing se_tpu/eval/pesq_np.py's utterance
alignment.  Development tool only.
"""

from __future__ import annotations

import ctypes

import numpy as np

LIB = ctypes.CDLL("/root/reference/PESQ.so")
MAXN = 50

OFF = {
    "Crude_DelayEst": 0x18,
    "UttSearch_Start": 0x28,
    "UttSearch_End": 0x1B8,
    "Utt_DelayEst": 0x348,
    "Utt_Delay": 0x4D8,
    "Utt_DelayConf": 0x668,
    "Utt_Start": 0x730,
    "Utt_End": 0x8C0,
    "pesq_mos": 0xA50,
    "mapped_mos": 0xA54,
}


class SignalInfo(ctypes.Structure):
    _fields_ = [
        ("Nsamples", ctypes.c_long),
        ("data", ctypes.POINTER(ctypes.c_float)),
        ("VAD", ctypes.POINTER(ctypes.c_float)),
        ("logVAD", ctypes.POINTER(ctypes.c_float)),
    ]


def measure(clean: np.ndarray, deg: np.ndarray):
    ref_si = SignalInfo()
    deg_si = SignalInfo()
    c = np.ascontiguousarray(clean, np.float64)
    d = np.ascontiguousarray(deg, np.float64)
    LIB.double_array_to_signal(
        ctypes.c_void_p(c.ctypes.data), ctypes.c_long(len(c)),
        ctypes.byref(ref_si),
    )
    LIB.double_array_to_signal(
        ctypes.c_void_p(d.ctypes.data), ctypes.c_long(len(d)),
        ctypes.byref(deg_si),
    )
    err = (ctypes.c_char * 0x1000)()
    flag = ctypes.c_long(0)
    etype = ctypes.c_char_p(b"unknown")
    LIB.pesq_measure(
        ctypes.byref(ref_si), ctypes.byref(deg_si), err,
        ctypes.byref(flag), ctypes.byref(etype),
    )
    buf = bytes(err)

    def longs(name):
        o = OFF[name]
        return np.frombuffer(buf[o : o + 8 * MAXN], dtype=np.int64).copy()

    def floats(name, n=MAXN):
        o = OFF[name]
        return np.frombuffer(buf[o : o + 4 * n], dtype=np.float32).copy()

    head = np.frombuffer(buf[:0x28], dtype=np.int64).copy()
    out = {
        "flag": flag.value,
        "head": head,  # first 5 longs (incl. Nutterances, Crude_DelayEst)
        "crude": int(head[3]),
        "search_start": longs("UttSearch_Start"),
        "search_end": longs("UttSearch_End"),
        "delay_est": longs("Utt_DelayEst"),
        "delay": longs("Utt_Delay"),
        "delay_conf": floats("Utt_DelayConf"),
        "utt_start": longs("Utt_Start"),
        "utt_end": longs("Utt_End"),
        "pesq_mos": float(floats("pesq_mos", 1)[0]),
        "mapped_mos": float(floats("mapped_mos", 1)[0]),
    }
    return out


def dump(clean, deg, label=""):
    m = measure(clean, deg)
    print(f"== {label} mapped_mos={m['mapped_mos']:.4f} "
          f"raw={m['pesq_mos']:.4f} head={m['head']}")
    # guess Nutterances: number of sensible utt entries
    for i in range(MAXN):
        s, e = m["utt_start"][i], m["utt_end"][i]
        if s == 0 and e == 0 and i > 0:
            break
        print(
            f"  utt{i}: search=[{m['search_start'][i]},{m['search_end'][i]}] "
            f"body=[{s},{e}] est={m['delay_est'][i]} delay={m['delay'][i]} "
            f"conf={m['delay_conf'][i]:.4f}"
        )


if __name__ == "__main__":
    import sys
    sys.path.insert(0, ".")
    from tools.pesq_oracle_battery import speechlike

    rng = np.random.default_rng(7)
    x = speechlike(rng)
    dump(x, x.copy(), "identical")
    k = 320
    d = np.zeros_like(x)
    d[k:] = x[:-k]
    dump(x, d, "delay320_trunc")
    dump(x, np.concatenate([np.zeros(k), x]), "delay320_prepend")


def make_signal(data_f64, nr, vad=None, logvad=None):
    """Build a SIGNAL_INFO over preprocessed float data (+ datapadding)."""
    si = SignalInfo()
    si.Nsamples = nr
    buf = np.ascontiguousarray(
        np.concatenate([data_f64, np.zeros(6000)])[: nr + 5120], np.float32
    )
    si._buf = buf  # keep alive
    si.data = buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    nwin = nr // 64
    va = np.ascontiguousarray(
        vad if vad is not None else np.zeros(nwin), np.float32
    )
    lv = np.ascontiguousarray(
        logvad if logvad is not None else np.zeros(nwin), np.float32
    )
    si._vad, si._lv = va, lv
    si.VAD = va.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    si.logVAD = lv.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    return si


class ErrBuf:
    def __init__(self):
        self.raw = (ctypes.c_char * 0x1000)()

    def set_long(self, name, idx, value):
        ctypes.memmove(
            ctypes.byref(self.raw, OFF[name] + 8 * idx),
            ctypes.byref(ctypes.c_long(value)), 8,
        )

    def get_long(self, name, idx=0):
        return ctypes.cast(
            ctypes.byref(self.raw, OFF[name] + 8 * idx),
            ctypes.POINTER(ctypes.c_long),
        ).contents.value

    def get_float(self, name, idx=0):
        return ctypes.cast(
            ctypes.byref(self.raw, OFF[name] + 4 * idx),
            ctypes.POINTER(ctypes.c_float),
        ).contents.value

    def set_crude(self, v):
        ctypes.memmove(ctypes.byref(self.raw, 0x18),
                       ctypes.byref(ctypes.c_long(v)), 8)


def oracle_time_align(ref_si, deg_si, sw_start, sw_end, est_delay):
    """Run the oracle's time_align for one utterance slot."""
    err = ErrBuf()
    err.set_long("UttSearch_Start", 0, sw_start)
    err.set_long("UttSearch_End", 0, sw_end)
    err.set_long("Utt_DelayEst", 0, est_delay)
    ftmp = np.zeros(1 << 20, np.float32)
    LIB.time_align(
        ctypes.byref(ref_si), ctypes.byref(deg_si), err.raw,
        ctypes.c_long(0),
        ftmp.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return err.get_long("Utt_Delay", 0), err.get_float("Utt_DelayConf", 0)


def oracle_utterance_locate(ref_si, deg_si, crude):
    err = ErrBuf()
    err.set_crude(crude)
    ftmp = np.zeros(1 << 22, np.float32)
    LIB.utterance_locate(
        ctypes.byref(ref_si), ctypes.byref(deg_si), err.raw,
        ftmp.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    n = err.get_long("Crude_DelayEst", -3)  # head[0] = Nutterances @0x0
    n = ctypes.cast(ctypes.byref(err.raw, 0),
                    ctypes.POINTER(ctypes.c_long)).contents.value
    out = []
    for i in range(n):
        out.append((
            err.get_long("Utt_Start", i), err.get_long("Utt_End", i),
            err.get_long("Utt_Delay", i), err.get_float("Utt_DelayConf", i),
            err.get_long("UttSearch_Start", i), err.get_long("UttSearch_End", i),
            err.get_long("Utt_DelayEst", i),
        ))
    return out

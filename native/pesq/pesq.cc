// PESQ — ITU-T P.862.2 (wideband, 16 kHz) native implementation.
//
// C++ port of the validated numpy specification in
// se_tpu/eval/pesq_np.py (kept in exact agreement by
// tests/test_pesq_native.py).  Constants are the published P.862 tables
// (p862_tables.h).  Exported entry:
//   double pesq_measure_wb(const double* clean, const double* degraded,
//                          long nclean, long ndeg, long fs);

#include <algorithm>
#include <cmath>
#include <cstring>
#include <vector>

#include "fftr.h"
#include "p862_tables.h"

namespace {

using se_native::fft;
using se_native::irfft;
using se_native::next_pow2;
using se_native::rfft;

constexpr long SEARCHBUFFER = 75;
constexpr long DATAPADDING_MSECS = 320;
constexpr long NF = 512;  // DOWNSAMPLE * 8
constexpr double TARGET_POWER = 1e7;
constexpr double SP = 6.910853e-006;
constexpr double SL = 1.866055e-001;
constexpr double THRESHOLD_BAD_FRAMES = 30.0;
constexpr int SMEAR_RANGE = 2;
constexpr int MIN_BAD_INTERVAL = 5;
constexpr long BAD_INTERVAL_SEARCH = 2048;

inline long dp_samples() { return DATAPADDING_MSECS * (P862_FS / 1000); }

struct Padded {
  std::vector<double> data;
  long nsamples;  // active length incl. search buffers, excl. datapadding
};

Padded pad_signal(const double* x, long n) {
  const long buf = SEARCHBUFFER * P862_DOWNSAMPLE;
  Padded p;
  p.nsamples = n + 2 * buf;
  p.data.assign(p.nsamples + dp_samples(), 0.0);
  std::memcpy(p.data.data() + buf, x, sizeof(double) * n);
  return p;
}

double pow_of(const std::vector<double>& x, long start, long end, long div) {
  double s = 0.0;
  for (long i = start; i < end; i++) s += x[i] * x[i];
  return s / (double)div;
}

// FFT-domain piecewise-linear dB filter over the active region.
void apply_filter_db(std::vector<double>& x, long nsamples,
                     const double* filt, int npts) {
  const long buf = SEARCHBUFFER * P862_DOWNSAMPLE;
  const long n = nsamples - 2 * buf + dp_samples();
  const long pow2 = next_pow2(n);
  auto X = rfft(x.data() + buf, n, pow2);
  for (long k = 0; k < (long)X.size(); k++) {
    double freq = (double)k * (double)P862_FS / (double)pow2;
    // piecewise-linear interpolation in (freq, dB) points
    double db;
    if (freq <= filt[0]) {
      db = filt[1];
    } else if (freq >= filt[2 * (npts - 1)]) {
      db = filt[2 * (npts - 1) + 1];
    } else {
      int j = 0;
      while (filt[2 * (j + 1)] < freq) j++;
      double f0 = filt[2 * j], f1 = filt[2 * (j + 1)];
      double d0 = filt[2 * j + 1], d1 = filt[2 * (j + 1) + 1];
      db = d0 + (d1 - d0) * (freq - f0) / (f1 - f0);
    }
    X[k] *= std::pow(10.0, db / 20.0);
  }
  auto y = irfft(X, pow2);
  for (long i = 0; i < n; i++) x[buf + i] = y[i];
}

void fix_power_level(Padded& p) {
  const long buf = SEARCHBUFFER * P862_DOWNSAMPLE;
  std::vector<double> filtered = p.data;
  apply_filter_db(filtered, p.nsamples, P862_ALIGN_FILTER_DB, 26);
  double power =
      pow_of(filtered, buf, p.nsamples - buf + dp_samples(),
             p.nsamples - 2 * buf + dp_samples());
  double g = std::sqrt(TARGET_POWER / power);
  for (auto& v : p.data) v *= g;
}

void iir_wb(Padded& p) {
  const double b0 = P862_WB_IIR_SOS[0], b1 = P862_WB_IIR_SOS[1],
               b2 = P862_WB_IIR_SOS[2], a1 = P862_WB_IIR_SOS[3],
               a2 = P862_WB_IIR_SOS[4];
  double x1 = 0, x2 = 0, y1 = 0, y2 = 0;
  for (auto& v : p.data) {
    double x0 = v;
    double y0 = b0 * x0 + b1 * x1 + b2 * x2 - a1 * y1 - a2 * y2;
    x2 = x1;
    x1 = x0;
    y2 = y1;
    y1 = y0;
    v = y0;
  }
}

void dc_block(Padded& p) {
  const long buf = SEARCHBUFFER * P862_DOWNSAMPLE;
  const long n = p.nsamples;
  double mean = 0.0;
  for (long i = buf; i < n - buf; i++) mean += p.data[i];
  mean /= (double)(n - 2 * buf);
  for (long i = buf; i < n - buf; i++) p.data[i] -= mean;
  for (long i = 0; i < P862_DOWNSAMPLE; i++) {
    double ramp = ((double)i + 0.5) / (double)P862_DOWNSAMPLE;
    p.data[buf + i] *= ramp;
    p.data[n - buf - 1 - i] *= ramp;
  }
}

void apply_vad(const Padded& p, std::vector<double>& logvad) {
  const long nwin = p.nsamples / P862_DOWNSAMPLE;
  std::vector<double> vad(nwin);
  for (long i = 0; i < nwin; i++) {
    double s = 0.0;
    for (long j = 0; j < P862_DOWNSAMPLE; j++) {
      double v = p.data[i * P862_DOWNSAMPLE + j];
      s += v * v;
    }
    vad[i] = s / (double)P862_DOWNSAMPLE;
  }
  double thresh = 0.0, vmax = 0.0;
  for (double v : vad) {
    thresh += v;
    vmax = std::max(vmax, v);
  }
  thresh /= (double)nwin;
  double level_min = vmax * 1e-4;
  if (level_min > 0) {
    for (auto& v : vad) v = std::max(v, level_min);
  }
  for (int it = 0; it < 12; it++) {
    double noise = 0.0;
    long cnt = 0;
    for (double v : vad)
      if (v <= thresh) {
        noise += v;
        cnt++;
      }
    if (!cnt) break;
    noise /= (double)cnt;
    if (std::fabs(thresh - 1.001 * noise) < 1e-12 * thresh) break;
    thresh = 1.001 * noise;
  }
  std::vector<char> active(nwin);
  for (long i = 0; i < nwin; i++) active[i] = vad[i] > thresh;
  for (long i = 1; i + 1 < nwin; i++) {
    if (!active[i] && active[i - 1] &&
        (active[std::min(i + 1, nwin - 1)] ||
         active[std::min(i + 2, nwin - 1)]))
      active[i] = 1;
  }
  for (long i = 1; i + 1 < nwin; i++) {
    if (active[i] && !active[i - 1] && !active[i + 1]) active[i] = 0;
  }
  logvad.assign(nwin, 0.0);
  for (long i = 0; i < nwin; i++) {
    if (active[i])
      logvad[i] = std::max(std::log(std::max(vad[i] / thresh, 1e-30)), 0.0);
  }
}

long crude_align(const std::vector<double>& lv_ref,
                 const std::vector<double>& lv_deg) {
  long n = (long)std::max(lv_ref.size(), lv_deg.size());
  long pow2 = next_pow2(2 * n);
  auto R = rfft(lv_ref.data(), (long)lv_ref.size(), pow2);
  auto D = rfft(lv_deg.data(), (long)lv_deg.size(), pow2);
  std::vector<std::complex<double>> prod(R.size());
  for (size_t k = 0; k < R.size(); k++) prod[k] = std::conj(R[k]) * D[k];
  auto corr = irfft(prod, pow2);
  long best = 0;
  double bv = corr[0];
  for (long i = 1; i < pow2; i++)
    if (corr[i] > bv) {
      bv = corr[i];
      best = i;
    }
  long lag = best < pow2 / 2 ? best : best - pow2;
  return lag * P862_DOWNSAMPLE;
}

// P.862 compute_delay on rectified series.
long compute_delay(const double* t1, const double* t2, long start, long stop,
                   long search, double* best_corr) {
  const long n = stop - start;
  const long pow2 = next_pow2(2 * search + n);
  double e1 = 0, e2 = 0;
  for (long i = start; i < stop; i++) {
    e1 += t1[i] * t1[i];
    e2 += t2[i] * t2[i];
  }
  double norm = std::sqrt(e1 * e2);
  if (norm <= 0) {
    *best_corr = 0.0;
    return 0;
  }
  std::vector<double> x1(pow2, 0.0), x2(pow2, 0.0);
  for (long i = 0; i < n; i++) {
    x1[i] = std::fabs(t1[start + i]);
    x2[i] = std::fabs(t2[start + i]);
  }
  auto X1 = rfft(x1.data(), pow2, pow2);
  auto X2 = rfft(x2.data(), pow2, pow2);
  std::vector<std::complex<double>> prod(X1.size());
  for (size_t k = 0; k < X1.size(); k++) prod[k] = std::conj(X1[k]) * X2[k];
  auto corr = irfft(prod, pow2);
  long best_lag = -search;
  double bv = -1e300;
  for (long lag = -search; lag <= search; lag++) {
    double v = corr[((lag % pow2) + pow2) % pow2];
    if (v > bv) {
      bv = v;
      best_lag = lag;
    }
  }
  *best_corr = bv / norm;
  return best_lag;
}

// ---- psychoacoustic model ------------------------------------------------

struct Model {
  long n_frames;
  std::vector<double> window;  // NF
  std::vector<double> ppd_ref, ppd_deg, mod_ref, mod_deg;  // [T][NB]
  std::vector<double> comp_x;                              // [NB]
  std::vector<double> ta_ref, scale;                       // [T]
};

void short_term_spec(const std::vector<double>& data,
                     const std::vector<double>& w, long start, double* hz) {
  std::vector<std::complex<double>> a(NF);
  for (long i = 0; i < NF; i++) a[i] = {data[start + i] * w[i], 0.0};
  fft(a, false);
  for (long k = 0; k < NF / 2; k++)
    hz[k] = a[k].real() * a[k].real() + a[k].imag() * a[k].imag();
}

void freq_warping(const double* hz, double* bands) {
  int hz_band = 0;
  for (int b = 0; b < P862_NB; b++) {
    double s = 0.0;
    for (int j = 0; j < P862_NR_OF_HZ_BANDS[b]; j++) s += hz[hz_band++];
    bands[b] = s * P862_POW_DENS_CORRECTION[b] * SP;
  }
}

double total_audible(const double* bands, double factor) {
  double t = 0.0;
  for (int b = 1; b < P862_NB; b++) {
    if (bands[b] > factor * P862_ABS_THRESH_POWER[b]) t += bands[b];
  }
  return t;
}

void intensity_warping(const double* bands, double* loud) {
  for (int b = 0; b < P862_NB; b++) {
    double h = P862_CENTRE_OF_BAND_BARK[b] < 4.0
                   ? 6.0 / (P862_CENTRE_OF_BAND_BARK[b] + 2.0)
                   : 1.0;
    h = std::pow(std::min(h, 2.0), 0.15);
    double z = 0.23 * h;
    double t = P862_ABS_THRESH_POWER[b];
    if (bands[b] > t) {
      double l = SL * std::pow(t / 0.5, z) *
                 (std::pow(0.5 + 0.5 * bands[b] / t, z) - 1.0);
      loud[b] = std::max(l, 0.0);
    } else {
      loud[b] = 0.0;
    }
  }
}

double pseudo_lp(const double* d, double p) {
  double total_w = 0.0, res = 0.0;
  for (int b = 1; b < P862_NB; b++) {
    double h = std::fabs(d[b]) * P862_WIDTH_OF_BAND_BARK[b];
    res += std::pow(h, p);
    total_w += P862_WIDTH_OF_BAND_BARK[b];
  }
  return std::pow(res / total_w, 1.0 / p) * total_w;
}

void frame_disturbances(const double* ppd_ref_row, const double* ppd_deg_row,
                        const double* comp_x, double* out_fd,
                        double* out_fda) {
  double mod_ref[64], mod_deg[64], loud_r[64], loud_d[64], d[64];
  for (int b = 0; b < P862_NB; b++) mod_ref[b] = ppd_ref_row[b] * comp_x[b];
  double ta_r = total_audible(mod_ref, 1.0);
  double ta_d = total_audible(ppd_deg_row, 1.0);
  double scale =
      std::min(std::max((ta_r + 5e3) / (ta_d + 5e3), 3e-4), 5.0);
  for (int b = 0; b < P862_NB; b++) mod_deg[b] = ppd_deg_row[b] * scale;
  intensity_warping(mod_ref, loud_r);
  intensity_warping(mod_deg, loud_d);
  for (int b = 0; b < P862_NB; b++) {
    double dd = loud_d[b] - loud_r[b];
    double m = 0.25 * std::min(loud_d[b], loud_r[b]);
    if (dd > m)
      dd -= m;
    else if (dd < -m)
      dd += m;
    else
      dd = 0.0;
    d[b] = dd;
  }
  *out_fd = pseudo_lp(d, 2.0);
  for (int b = 0; b < P862_NB; b++) {
    double ratio =
        std::pow((mod_deg[b] + 50.0) / (mod_ref[b] + 50.0), 1.2);
    double asym = ratio < 3.0 ? 0.0 : std::min(ratio, 12.0);
    d[b] *= asym;
  }
  *out_fda = pseudo_lp(d, 1.0);
}

double lpq_weight(const std::vector<double>& fd) {
  const int SYL = 20;
  double result_time = 0.0, total_w = 0.0;
  for (long start = 0; start < (long)fd.size(); start += SYL / 2) {
    double r = 0.0;
    long end = std::min<long>(start + SYL, (long)fd.size());
    if (end <= start) continue;
    for (long f = start; f < end; f++) r += std::pow(fd[f], 6.0);
    r = std::pow(r / (double)SYL, 1.0 / 6.0);
    result_time += r * r;
    total_w += 1.0;
  }
  return std::sqrt(result_time / total_w);
}

double psychoacoustic_model(const Padded& ref, const Padded& deg, long nsamples,
                            long delay) {
  const long buf = SEARCHBUFFER * P862_DOWNSAMPLE;
  const long n_frames = (nsamples - 2 * buf) / (NF / 2) - 1;
  std::vector<double> w(NF);
  for (long i = 0; i < NF; i++)
    w[i] = 0.5 * (1.0 - std::cos(2.0 * M_PI * (double)i / (double)NF));

  std::vector<double> ppd_ref(n_frames * P862_NB), ppd_deg(n_frames * P862_NB);
  std::vector<double> hz(NF / 2);
  std::vector<char> silent(n_frames);
  const long deg_len = (long)deg.data.size();
  for (long f = 0; f < n_frames; f++) {
    long sr = buf + f * (NF / 2);
    short_term_spec(ref.data, w, sr, hz.data());
    freq_warping(hz.data(), &ppd_ref[f * P862_NB]);
    long sd = sr + delay;
    if (sd < 0) sd = 0;
    if (sd + NF > deg_len) sd = deg_len - NF;
    short_term_spec(deg.data, w, sd, hz.data());
    freq_warping(hz.data(), &ppd_deg[f * P862_NB]);
    silent[f] = total_audible(&ppd_ref[f * P862_NB], 1e2) < 1e7;
  }

  // time-averaged audible spectra (per-band 100x threshold gating)
  std::vector<double> avg_ref(P862_NB, 0.0), avg_deg(P862_NB, 0.0);
  for (long f = 0; f < n_frames; f++) {
    if (silent[f]) continue;
    for (int b = 0; b < P862_NB; b++) {
      double r = ppd_ref[f * P862_NB + b];
      double d = ppd_deg[f * P862_NB + b];
      if (r > 100.0 * P862_ABS_THRESH_POWER[b]) avg_ref[b] += r;
      if (d > 100.0 * P862_ABS_THRESH_POWER[b]) avg_deg[b] += d;
    }
  }
  std::vector<double> comp_x(P862_NB);
  for (int b = 0; b < P862_NB; b++) {
    avg_ref[b] /= (double)n_frames;
    avg_deg[b] /= (double)n_frames;
    comp_x[b] = std::min(
        std::max((avg_deg[b] + 1000.0) / (avg_ref[b] + 1000.0), 0.01), 100.0);
  }
  std::vector<double> mod_ref(ppd_ref);
  for (long f = 0; f < n_frames; f++)
    for (int b = 0; b < P862_NB; b++) mod_ref[f * P862_NB + b] *= comp_x[b];

  // short-term gain compensation applied to deg
  std::vector<double> ta_ref(n_frames), scale(n_frames);
  double old_scale = 1.0;
  std::vector<double> mod_deg(ppd_deg);
  for (long f = 0; f < n_frames; f++) {
    double tr = total_audible(&mod_ref[f * P862_NB], 1.0);
    double td = total_audible(&ppd_deg[f * P862_NB], 1.0);
    ta_ref[f] = tr;
    double s = (tr + 5e3) / (td + 5e3);
    if (f > 0) s = 0.2 * old_scale + 0.8 * s;
    old_scale = s;
    s = std::min(std::max(s, 3e-4), 5.0);
    scale[f] = s;
    for (int b = 0; b < P862_NB; b++) mod_deg[f * P862_NB + b] *= s;
  }

  std::vector<double> fd(n_frames), fda(n_frames);
  std::vector<double> loud_r(P862_NB), loud_d(P862_NB), d(P862_NB);
  for (long f = 0; f < n_frames; f++) {
    intensity_warping(&mod_ref[f * P862_NB], loud_r.data());
    intensity_warping(&mod_deg[f * P862_NB], loud_d.data());
    for (int b = 0; b < P862_NB; b++) {
      double dd = loud_d[b] - loud_r[b];
      double m = 0.25 * std::min(loud_d[b], loud_r[b]);
      if (dd > m)
        dd -= m;
      else if (dd < -m)
        dd += m;
      else
        dd = 0.0;
      d[b] = dd;
    }
    fd[f] = pseudo_lp(d.data(), 2.0);
    for (int b = 0; b < P862_NB; b++) {
      double ratio = std::pow(
          (mod_deg[f * P862_NB + b] + 50.0) / (mod_ref[f * P862_NB + b] + 50.0),
          1.2);
      double asym = ratio < 3.0 ? 0.0 : std::min(ratio, 12.0);
      d[b] *= asym;
    }
    fda[f] = pseudo_lp(d.data(), 1.0);
  }

  // bad-interval realignment on the raw disturbances
  bool any_bad = false;
  for (long f = 0; f < n_frames; f++)
    if (fd[f] > THRESHOLD_BAD_FRAMES) any_bad = true;
  if (any_bad) {
    std::vector<char> bad(n_frames), smeared(n_frames, 0);
    for (long f = 0; f < n_frames; f++) bad[f] = fd[f] > THRESHOLD_BAD_FRAMES;
    for (long f = 0; f < n_frames; f++) {
      long lo = std::max<long>(0, f - SMEAR_RANGE);
      long hi = std::min<long>(n_frames, f + SMEAR_RANGE + 1);
      bool left = false, right = false;
      for (long i = lo; i <= f; i++) left |= bad[i];
      for (long i = f; i < hi; i++) right |= bad[i];
      smeared[f] = left && right;
    }
    const long active_lo = buf;
    const long active_hi =
        std::min((long)ref.data.size(), (long)deg.data.size()) - buf;
    long f = 0;
    while (f < n_frames) {
      if (!smeared[f]) {
        f++;
        continue;
      }
      long g = f;
      while (g < n_frames && smeared[g]) g++;
      if (g - f >= MIN_BAD_INTERVAL) {
        long s0 = buf + f * (NF / 2);
        long s1 = buf + (g - 1) * (NF / 2) + NF;
        long m = (s1 - s0) + 2 * BAD_INTERVAL_SEARCH;
        std::vector<double> seg_ref(m), seg_deg(m);
        for (long i = 0; i < m; i++) {
          long idx = s0 - BAD_INTERVAL_SEARCH + i;
          long ic = std::min(std::max(idx, active_lo), active_hi - 1);
          seg_ref[i] = ref.data[ic];
          long idd = std::min(std::max(idx + delay, active_lo), active_hi - 1);
          seg_deg[i] = deg.data[idd];
        }
        double corr;
        long delta = compute_delay(seg_ref.data(), seg_deg.data(), 0, m,
                                   BAD_INTERVAL_SEARCH, &corr);
        if (corr < 0.5) delta = 0;
        if (delta != 0) {
          long new_delay = delay + delta;
          std::vector<double> hz_r(NF / 2), hz_d(NF / 2);
          double row_r[64], row_d[64];
          for (long fr = f; fr < g; fr++) {
            long sr = buf + fr * (NF / 2);
            long sd = sr + new_delay;
            if (sd < 0 || sd + NF > deg_len) continue;
            short_term_spec(ref.data, w, sr, hz_r.data());
            short_term_spec(deg.data, w, sd, hz_d.data());
            freq_warping(hz_r.data(), row_r);
            freq_warping(hz_d.data(), row_d);
            double nfd, nfda;
            frame_disturbances(row_r, row_d, comp_x.data(), &nfd, &nfda);
            fd[fr] = std::min(fd[fr], nfd);
            fda[fr] = std::min(fda[fr], nfda);
          }
        }
      }
      f = g;
    }
  }

  // per-frame weighting and caps
  for (long f = 0; f < n_frames; f++) {
    double h = std::pow((ta_ref[f] + 1e5) / 1e7, 0.04);
    fd[f] = std::min(fd[f] / h, 45.0);
    fda[f] = std::min(fda[f] / h, 45.0);
  }
  double d_ind = lpq_weight(fd);
  double a_ind = lpq_weight(fda);
  return 4.5 - 0.1 * d_ind - 0.0309 * a_ind;
}

}  // namespace

extern "C" double pesq_measure_wb(const double* clean, const double* degraded,
                                  long nclean, long ndeg, long fs) {
  (void)fs;  // 16 kHz model
  Padded ref = pad_signal(clean, nclean);
  Padded deg = pad_signal(degraded, ndeg);

  fix_power_level(ref);
  fix_power_level(deg);
  iir_wb(ref);
  iir_wb(deg);
  dc_block(ref);
  dc_block(deg);

  std::vector<double> lv_ref, lv_deg;
  apply_vad(ref, lv_ref);
  apply_vad(deg, lv_deg);
  long delay = crude_align(lv_ref, lv_deg);

  const long n = std::min(ref.nsamples, deg.nsamples);
  const long buf = SEARCHBUFFER * P862_DOWNSAMPLE;
  // sample-accurate refinement of the crude delay
  long lo = buf, hi = n - buf;
  if (lo + delay >= 0 && hi + delay <= (long)deg.data.size()) {
    double corr;
    long fine = compute_delay(ref.data.data() + lo, deg.data.data() + lo + delay,
                              0, hi - lo, 2 * P862_DOWNSAMPLE, &corr);
    if (corr >= 0.5) delay += fine;
  }

  double raw = psychoacoustic_model(ref, deg, n, delay);
  return 0.999 + 4.0 / (1.0 + std::exp(-1.3669 * raw + 3.8224));
}

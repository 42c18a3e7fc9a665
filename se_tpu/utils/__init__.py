from .stats import get_mu_sig, get_statistics_inp

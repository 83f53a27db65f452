from . import prox, regularization, tv_condat  # noqa: F401

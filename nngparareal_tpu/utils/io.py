"""Result-artifact helpers (reference globals.py:1-34, preprocessing.py)."""

import os
import pickle


def store_pickle(obj, name, path=""):
    if path and not os.path.exists(path):
        os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, name), "wb") as fh:
        pickle.dump(obj, fh, pickle.HIGHEST_PROTOCOL)


def read_pickle(name, path=""):
    with open(os.path.join(path, name), "rb") as fh:
        return pickle.load(fh)


def store_fig(fig, name, img_dir="img"):
    """Save a figure as both png and pdf under img/ (globals.py:27-29)."""
    os.makedirs(img_dir, exist_ok=True)
    fig.savefig(os.path.join(img_dir, f"{name}.png"), dpi=200)
    fig.savefig(os.path.join(img_dir, f"{name}.pdf"))


def slim_run(out, drop=("u", "u_hist", "x", "D", "data_x", "data_D")):
    """Strip bulky arrays from a stored run dict, like the reference's
    preprocessing.py:5-66 repo-slimming pass. Returns a shallow copy."""
    return {k: v for k, v in out.items() if k not in drop}


def print_cond(K, jitted=False):
    """Eigenvalue/conditioning diagnostics (reference models.py:57-62)."""
    import numpy as np

    e_vals = np.abs(np.linalg.eig(np.asarray(K))[0])
    tag = "--- Jitted:" if jitted else "--"
    print(
        f"{tag} max |eig|: {e_vals.max():0.2e}, min |eig|: {e_vals.min():0.2e}, "
        f"ratio: {e_vals.max() / e_vals.min():0.2e}, "
        f"truth: {np.linalg.cond(np.asarray(K)):0.2e}"
    )

"""Model conversion CLI: torch DRN .pth -> framework pytree, with the
structural + numeric parity checks (replaces models/convert_pth2ch.py)."""

from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("pth_path", type=str)
    p.add_argument("out_path", type=str)
    p.add_argument("--model", type=str, default="drn_c_26")
    p.add_argument("--check", action="store_true", default=False,
                   help="run a numeric parity check against the torch "
                        "donor on random input (needs torch)")
    args = p.parse_args(argv)

    from spalign_tpu.convert import load_drn_checkpoint, save_pytree

    model, variables = load_drn_checkpoint(args.pth_path, args.model)
    save_pytree(variables, args.out_path)
    print(f"converted {args.pth_path} -> {args.out_path}")

    if args.check:
        import numpy as np
        import torch

        import jax.numpy as jnp

        state = torch.load(args.pth_path, map_location="cpu",
                           weights_only=True)
        from spalign_tpu.convert import torch_drn

        tmodel = torch_drn.TORCH_DRN_FACTORIES[args.model]()
        tmodel.load_state_dict(state)
        tmodel.eval()
        x = np.random.RandomState(0).randn(1, 64, 64, 3).astype(
            np.float32)
        with torch.no_grad():
            tout, _ = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        jout, _ = model.apply(variables, jnp.asarray(x), train=False)
        np.testing.assert_allclose(
            np.asarray(jout), tout.numpy().transpose(0, 2, 3, 1),
            rtol=1e-3, atol=1e-4)
        print("parity check passed (<=1e-4)")


if __name__ == "__main__":
    main()

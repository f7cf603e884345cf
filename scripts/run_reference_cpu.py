"""Run the PyTorch reference (read-only at /root/reference) on CPU.

The reference hard-codes `.cuda()` everywhere (e.g. SNAG.py:23-28,
main.py:100-104, 519); this wrapper no-ops every CUDA entry point before
handing control to the unmodified reference `main.py`, so it runs on the
CPU wheel installed here.  Used to mint real baseline numbers
(BASELINE.md) and as the end-to-end parity oracle against exported
synthetic datasets (snag_tpu/data/export_reference.py).

Usage:  python scripts/run_reference_cpu.py [reference main.py args...]
"""

import os
import os.path as osp

import sys

HERE = osp.dirname(osp.abspath(__file__))
REF = "/root/reference/SNAG_MMEA"


def main():
    sys.path.insert(0, osp.join(HERE, "_shims"))   # easydict
    sys.path.insert(0, REF)

    import torch

    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    torch.cuda.set_device = lambda *a, **k: None
    torch.cuda.empty_cache = lambda *a, **k: None

    main_path = osp.join(REF, "main.py")
    sys.argv = [main_path] + sys.argv[1:]
    # the reference's default --dump_path is "dump/" relative to the cwd,
    # which after the chdir below would land INSIDE the read-only reference
    # tree (torchlight/logger.py:118-138 mkdir -p's it); keep every run's
    # dump out of /root/reference
    if "--dump_path" not in sys.argv:
        sys.argv += ["--dump_path", "/tmp/refdump"]
    os.chdir(REF)  # torchlight resolves relative resources from the cwd

    # main.py:517 does torch.device(gpu_index), which demands a CUDA device;
    # substitute that single expression in-memory (the reference tree is
    # read-only and must stay unmodified)
    src = open(main_path, encoding="utf-8").read()
    patched = src.replace("cfgs.device = torch.device(cfgs.gpu)",
                          "cfgs.device = torch.device('cpu')")
    assert patched != src, "expected device line not found in reference main.py"
    # latent reference bugs in the --only_test branch (main.py:522): it
    # calls runner.test(last_epoch=False) but Runner.test takes no such
    # kwarg (main.py:364), and _test reads self.loss_item / self.epoch
    # which only run() sets, and decrements early_stop_count / reads best_mrr
    # (main.py:439-452 vs 139-150) — shim them so only_test runs at all
    patched = patched.replace(
        "runner.test(last_epoch=False)",
        ("runner.loss_item = 0.0; runner.epoch = 0; "
        "runner.early_stop_count = 10**9; runner.best_mrr = 0; "
        "runner.loss_log = Loss_log(); runner.test()"))
    g = {"__name__": "__main__", "__file__": main_path}
    exec(compile(patched, main_path, "exec"), g)


if __name__ == "__main__":
    main()

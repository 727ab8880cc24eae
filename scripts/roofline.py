#!/usr/bin/env python
"""Analytic HBM-traffic model for the ResNet-50 PixelLink train step.

Produces the bytes-per-step table behind PERF.md: for every conv stage of
the flagship model at 512x512, the activation bytes a batch-BN training
step must move under XLA's measured fusion structure, and the resulting
roofline throughput bound on a TPU v5e (819 GB/s HBM, 197 bf16 TFLOP/s).

Traffic model per conv+BN+relu (bf16 activations, f32 accumulation in
fused reductions — the measured-optimal form, DESIGN.md):

  forward : read X | write Yraw | stats pass (read Yraw) |
            normalize+relu (read Yraw, write Y)
  backward: BN-grad reductions (read dY, read Yraw) |
            dxhat pass (read dY, read Yraw, write dXbn) |
            relu mask source (read Y) |
            dW (read X, read dXbn) | dX (read dXbn, write dX)

i.e. fwd = Sin*Cin + 4*So*Co, bwd = 2*Sin*Cin + 8*So*Co elements.
freeze_bn drops the stat pass and the BN-grad reductions and lets the
affine fold into the conv epilogue:
  fwd = Sin*Cin + So*Co ; bwd = 2*Sin*Cin + 5*So*Co.

Run: python scripts/roofline.py [--batch 32]
"""

import argparse

BYTES = 2  # bf16 activations
HBM_GBPS = 819.0     # v5e
MXU_TFLOPS = 197.0   # v5e bf16


def resnet50_pixellink_stages(s=512):
    """[(name, Sin_h, Cin, So_h, Co, k)] per conv; spatial dims square."""
    st = []
    st.append(("conv1 7x7/2", s, 3, s // 2, 64, 7))
    # (block, n_units, spatial_in, cin, bneck, cout)
    blocks = [
        (1, 3, s // 4, 64, 64, 256),
        (2, 4, s // 8, 256, 128, 512),
        (3, 6, s // 16, 512, 256, 1024),
        (4, 3, s // 32, 1024, 512, 2048),
    ]
    for b, n, sp, cin, bk, cout in blocks:
        for u in range(n):
            last = u == n - 1 and b < 4
            so = sp // 2 if last else sp
            cu = cin if u == 0 else cout
            st.append((f"b{b}u{u+1} 1x1a", sp, cu, sp, bk, 1))
            st.append((f"b{b}u{u+1} 3x3", sp, bk, so, bk, 3))
            st.append((f"b{b}u{u+1} 1x1b", so, bk, so, cout, 1))
            if u == 0:
                st.append((f"b{b}u{u+1} proj", sp, cu, sp, cout, 1))
    # PixelLink head: 1x1 score+link convs per pyramid level (18 ch) +
    # upsample/add cascade; traffic is dominated by reading the pyramid
    for name, sp, cin in (("head p5", s // 32, 2048), ("head p4", s // 16, 512),
                          ("head p3", s // 8, 256), ("head p2", s // 4, 64)):
        st.append((name, sp, cin, sp, 18, 1))
    return st


def stage_traffic(sin, cin, so, co, freeze_bn=False, bn=True):
    """(fwd_elems, bwd_elems) per image for one conv(+BN+relu)."""
    x = sin * sin * cin
    y = so * so * co
    if not bn:  # plain conv (head)
        return x + y, 2 * x + 3 * y
    if freeze_bn:
        return x + y, 2 * x + 5 * y
    return x + 4 * y, 2 * x + 8 * y


def unit_boundary_traffic(stages):
    """Residual add+relu elementwise passes per unit (fwd 3y + bwd 3y)."""
    t = 0
    for name, sin, cin, so, co, k in stages:
        if "1x1b" in name:
            t += 6 * so * so * co
    return t


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--markdown", action="store_true")
    args = ap.parse_args()
    b = args.batch

    stages = resnet50_pixellink_stages(args.size)
    rows = []
    tot = {"bn": 0, "frozen": 0, "flops": 0}
    for name, sin, cin, so, co, k in stages:
        is_head = name.startswith("head")
        f, w = stage_traffic(sin, cin, so, co, bn=not is_head)
        ffr, wfr = stage_traffic(sin, cin, so, co, freeze_bn=True,
                                 bn=not is_head)
        el = (f + w) * b * BYTES
        elf = (ffr + wfr) * b * BYTES
        flops = 3 * 2 * so * so * co * cin * k * k * b  # fwd+dW+dX matmuls
        tot["bn"] += el
        tot["frozen"] += elf
        tot["flops"] += flops
        rows.append((name, sin, cin, so, co, el / 1e9, flops / 1e12))

    add = unit_boundary_traffic(stages) * b * BYTES
    tot["bn"] += add
    tot["frozen"] += add

    hdr = f"{'stage':<14}{'Sin':>5}{'Cin':>6}{'So':>5}{'Co':>6}" \
          f"{'GB/step':>9}{'TFLOP':>7}"
    print(hdr)
    print("-" * len(hdr))
    groups = {}
    for name, sin, cin, so, co, gb, tf in rows:
        key = name.split("u")[0].split()[0] if name[0] == "b" else name
        g = groups.setdefault(key, [0.0, 0.0])
        g[0] += gb
        g[1] += tf
        if args.markdown:
            continue
        print(f"{name:<14}{sin:>5}{cin:>6}{so:>5}{co:>6}{gb:>9.3f}{tf:>7.2f}")
    print("-" * len(hdr))
    for key, (gb, tf) in groups.items():
        print(f"{key:<14}{'':>22}{gb:>9.3f}{tf:>7.2f}")
    print(f"{'residual add':<14}{'':>22}{add/1e9:>9.3f}{0:>7.2f}")
    print("-" * len(hdr))

    for mode in ("bn", "frozen"):
        gb = tot[mode] / 1e9
        t_mem = gb / HBM_GBPS * 1000
        t_mxu = tot["flops"] / 1e12 / MXU_TFLOPS * 1000
        bound = max(t_mem, t_mxu)
        print(f"[{mode:>6}] traffic {gb:6.1f} GB/step @ b{b} -> "
              f"HBM-bound {t_mem:6.1f} ms, MXU-bound {t_mxu:5.1f} ms "
              f"=> ceiling {b / bound * 1000:6.0f} img/s/chip")
    print(f"FLOPs: {tot['flops']/1e12:.1f} TFLOP/step "
          f"({tot['flops']/1e12/b*1000:.1f} GFLOP/img)")


if __name__ == "__main__":
    main()

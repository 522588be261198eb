#!/bin/bash
# RETIRED (round 5, AB_QUALITY.md conclusion 18). This was the round-4
# combined-bundle sweep (8 LM iters + 25-iter keysteps), gated on BOTH
# single-axis gates reading green. lm8 gated GREEN (conclusion 17) but
# m25 gated NO (conclusion 18: PSNR seed-mean 30.01 = -8.2% vs parity
# 32.68) — the launch precondition is failed, so this sweep must not
# run: the combined bundle cannot gate green when one of its axes
# fails the PSNR gate on the same protocol. Kept as a record; the
# schedule axis is closed at mapping.n_iters=50 (conclusion 9).
echo "sweep_r4d is RETIRED: m25 axis gate-failed (AB_QUALITY.md #18)." >&2
exit 1



def test_compound_augmentation_train_only():
    """pair_iterator stacks a second degradation pass with probability
    compound_p; make_pairs' default (0) stays byte-identical so the
    held-out ind eval family is unmoved by the training-side knob."""
    import numpy as np

    from video_enhancer_tpu.train.data import make_pairs

    fr = np.random.default_rng(0).random((8, 96, 96, 3)).astype(np.float32)
    a = make_pairs(fr, 3, 3, 48, 4, seed=5)
    b = make_pairs(fr, 3, 3, 48, 4, seed=5, compound_p=0.0)
    assert np.array_equal(a["lr"], b["lr"])
    assert np.array_equal(a["hr"], b["hr"])
    c = make_pairs(fr, 3, 3, 48, 4, seed=5, compound_p=1.0)
    # Item 0 shares the rng stream up to the first compound draw: its HR
    # crop is identical while its LR gained a second degradation pass.
    # (Later items' crops legitimately shift — the extra draw advances
    # the stream.)
    assert np.array_equal(c["hr"][0], a["hr"][0])
    assert not np.array_equal(c["lr"][0], a["lr"][0])
    assert c["lr"].min() >= 0.0 and c["lr"].max() <= 1.0


def test_eval_degradation_realizations_pinned():
    """The default (non-wide) degradation path must keep its RNG draw
    ORDER: the held-out eval realizations are a function of it, and a
    round-5 reorder silently re-drew every historical gain number (the
    seedvr2 snapshot re-measured -1.33 where round 4 recorded -2.73 on
    identical weights). This pins the round-4 seed-999 eval batch."""
    from video_enhancer_tpu.io.demo import make_demo_frames
    from video_enhancer_tpu.train.data import make_pairs

    frames = make_demo_frames(24, (256, 256))
    pr = make_pairs(frames, 2, 4, 128, 4, seed=999)
    assert abs(float(pr["lr"].mean()) - 0.4943028390407562) < 1e-9
    assert abs(float(pr["hr"].mean()) - 0.49455785751342773) < 1e-9

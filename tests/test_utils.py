import numpy as np

from drt_tpu.utils.image import read_exr, write_exr, write_png


def test_exr_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 2, size=(13, 17, 3)).astype(np.float32)
    p = str(tmp_path / "t.exr")
    write_exr(p, img)
    back = read_exr(p)
    assert back.shape == (13, 17, 4)
    # half-float roundtrip tolerance
    np.testing.assert_allclose(back[:, :, :3], img, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(back[:, :, 3], 1.0)


def test_exr_magic_and_version(tmp_path):
    p = str(tmp_path / "t.exr")
    write_exr(p, np.zeros((2, 2, 3), np.float32))
    with open(p, "rb") as f:
        head = f.read(8)
    assert head[:4] == bytes([0x76, 0x2F, 0x31, 0x01])  # OpenEXR magic
    assert head[4] == 2  # version


def test_png_roundtrip(tmp_path):
    import zlib
    import struct
    img = np.zeros((4, 5, 3), np.float32)
    img[1, 2] = [1.0, 0.5, 0.25]
    p = str(tmp_path / "t.png")
    write_png(p, img)
    data = open(p, "rb").read()
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    w, h = struct.unpack(">II", data[16:24])
    assert (w, h) == (5, 4)


def test_checkpoint_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp
    import optax
    from drt_tpu.optim import init_state
    from drt_tpu.scene import Params
    from drt_tpu.utils import checkpoint

    params = Params(albedo=jnp.ones((3, 3)) * 0.5,
                    emission=jnp.ones((1, 3)))
    opt = optax.adam(1e-2)
    state = init_state(params, opt)
    key = jax.random.key(42)
    p = str(tmp_path / "ck.npz")
    checkpoint.save(p, state, key)
    like = init_state(Params(albedo=jnp.zeros((3, 3)),
                             emission=jnp.zeros((1, 3))), opt)
    restored, rkey = checkpoint.restore(p, like)
    np.testing.assert_allclose(restored.params.albedo, 0.5)
    assert jax.random.uniform(rkey) == jax.random.uniform(key)

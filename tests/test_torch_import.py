"""Reference-checkpoint import: a torch model with the reference's exact
module naming is exported and imported; the deterministic forward paths
must then agree between torch and JAX (SURVEY.md §7 hard part (e))."""

import numpy as np
import pytest
import torch
import torch.nn as nn
import jax
import jax.numpy as jnp

from mmnc_tpu.models import build_model
from mmnc_tpu.utils.torch_import import import_reference_state_dict

PED = 2.0 ** -36


class RefGDN(nn.Module):
    """CompressAI-convention GDN: parameters stored in reparam (sqrt) space."""

    def __init__(self, c, inverse=False):
        super().__init__()
        self.inverse = inverse
        beta_min = 1e-6
        self.beta = nn.Parameter(torch.sqrt(torch.ones(c) + PED))
        self.gamma = nn.Parameter(torch.sqrt(0.1 * torch.eye(c) + PED))
        self._beta_bound = (beta_min + PED) ** 0.5
        self._gamma_bound = PED ** 0.5

    def forward(self, x):
        beta = torch.clamp(self.beta, min=self._beta_bound) ** 2 - PED
        gamma = torch.clamp(self.gamma, min=self._gamma_bound) ** 2 - PED
        norm = nn.functional.conv2d(x * x, gamma.view(*gamma.shape, 1, 1),
                                    beta)
        return x * torch.sqrt(norm) if self.inverse else x * torch.rsqrt(norm)


def _conv(i, o, k=5, s=2):
    return nn.Conv2d(i, o, k, stride=s, padding=k // 2)


def _deconv(i, o, k=5, s=2):
    return nn.ConvTranspose2d(i, o, k, stride=s, output_padding=s - 1,
                              padding=k // 2)


def _enc_head(in_ch, c):
    return nn.Sequential(
        _conv(in_ch, c // 2, 3, 1), RefGDN(c // 2),
        _conv(c // 2, c), RefGDN(c), _conv(c, c), RefGDN(c),
        _conv(c, c), RefGDN(c), _conv(c, c), RefGDN(c),
        _conv(c, c), RefGDN(c))


def _dec_head(in_ch, out_ch):
    mid = in_ch // 2
    return nn.Sequential(
        _deconv(in_ch, mid), RefGDN(mid, True),
        _conv(mid, mid, 3, 1), RefGDN(mid, True),
        _deconv(mid, mid), RefGDN(mid, True),
        _conv(mid, mid, 3, 1), RefGDN(mid, True),
        _deconv(mid, out_ch), RefGDN(out_ch, True),
        _deconv(out_ch, out_ch), RefGDN(out_ch, True),
        _conv(out_ch, out_ch, 3, 1))


class RefShapedModel(nn.Module):
    """Reference state_dict layout for the single-task mixed codec."""

    def __init__(self, in_ch=3, c=4, m=8):
        super().__init__()
        n = c  # one task
        self.model = nn.ModuleDict({
            "input_heads": nn.ModuleList([_enc_head(in_ch, c)]),
            "compressor": nn.ModuleDict({
                "g_a": nn.Sequential(
                    _conv(n, n), RefGDN(n), _conv(n, n), RefGDN(n),
                    _conv(n, n), RefGDN(n), _conv(n, m)),
                "g_s": nn.Sequential(
                    _deconv(m, n), RefGDN(n, True), _deconv(n, n),
                    RefGDN(n, True), _deconv(n, n), RefGDN(n, True),
                    _deconv(n, n)),
                "h_a": nn.Sequential(
                    _conv(m, n, 3, 1), nn.ReLU(), _conv(n, n), nn.ReLU(),
                    _conv(n, n)),
                "h_s": nn.Sequential(
                    _deconv(n, n), nn.ReLU(), _deconv(n, n), nn.ReLU(),
                    _conv(n, m, 3, 1), nn.ReLU()),
            }),
            "output_heads": nn.ModuleList([_dec_head(n, in_ch)]),
        })

    @torch.no_grad()
    def forward_paths(self, x):
        stacked = self.model["input_heads"][0](x)
        y = self.model["compressor"]["g_a"](stacked)
        z = self.model["compressor"]["h_a"](torch.abs(y))
        scales = self.model["compressor"]["h_s"](torch.round(z))
        y_hat = torch.round(y)
        xh = self.model["compressor"]["g_s"](y_hat)
        rec = self.model["output_heads"][0](xh)
        return y, z, scales, rec


@pytest.fixture(scope="module")
def imported():
    torch.manual_seed(0)
    tmodel = RefShapedModel().eval()
    # randomize so the comparison is non-trivial
    with torch.no_grad():
        for p in tmodel.parameters():
            p.add_(0.02 * torch.randn_like(p))

    jmodel = build_model(1, ["rgb"], latent_channels=8, conv_channels=4)
    params = import_reference_state_dict(tmodel.state_dict(), jmodel)

    # graft imported params over an initialized tree (keeps EB params)
    variables = jmodel.init(jax.random.PRNGKey(0),
                            jmodel.example_batch(image_size=256))
    merged = dict(variables["params"])
    for k, v in params.items():
        if k == "compressor":
            comp = dict(merged["compressor"])
            comp.update(v)
            merged["compressor"] = comp
        else:
            merged[k] = v
    return tmodel, jmodel, {"params": merged}


def test_latents_match(imported):
    tmodel, jmodel, variables = imported
    rng = np.random.default_rng(0)
    x = rng.random((2, 256, 256, 3)).astype(np.float32)

    ty, tz, tscales, trec = tmodel.forward_paths(
        torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))

    jy, jz = jmodel.net.apply(variables, {"rgb": jnp.asarray(x)},
                              method=type(jmodel.net).analyze)
    np.testing.assert_allclose(
        np.transpose(np.asarray(jy), (0, 3, 1, 2)), ty.numpy(),
        rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(
        np.transpose(np.asarray(jz), (0, 3, 1, 2)), tz.numpy(),
        rtol=1e-3, atol=1e-4)


def test_reconstruction_matches(imported):
    tmodel, jmodel, variables = imported
    rng = np.random.default_rng(1)
    x = rng.random((1, 256, 256, 3)).astype(np.float32)

    _, _, _, trec = tmodel.forward_paths(
        torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))

    jy, _ = jmodel.net.apply(variables, {"rgb": jnp.asarray(x)},
                             method=type(jmodel.net).analyze)
    jrec = jmodel.decode_from_latents(variables, jnp.round(jy), None)["rgb"]
    np.testing.assert_allclose(
        np.transpose(np.asarray(jrec), (0, 3, 1, 2)), trec.numpy(),
        rtol=1e-3, atol=1e-4)


# --- disjoint/shared layout (amputated g_s: 4-deconv upsample stack + nested
# --- Sequential at index 7, reference src/models/disjoint_latent.py:117-185)

def _upsample_plus_head(slice_in, conv_channels, n_tasks, out_ch):
    cc = conv_channels // n_tasks
    return nn.Sequential(
        _deconv(slice_in, cc), RefGDN(cc, True),
        _deconv(cc, cc), RefGDN(cc, True),
        _deconv(cc, cc), RefGDN(cc, True),
        _deconv(cc, conv_channels),
        _dec_head(conv_channels, out_ch))


class RefShapedSharedModel(nn.Module):
    """Reference state_dict layout for the 2-task shared-latent codec
    (model 4): per-task slices + one shared slice, g_s amputated."""

    def __init__(self, c=4, m=9, in_chs=(3, 1)):
        super().__init__()
        n = c * len(in_chs)
        self.cpt = m // (len(in_chs) + 1)  # channels per task/shared block
        self.model = nn.ModuleDict({
            "input_heads": nn.ModuleList(
                [_enc_head(ic, c) for ic in in_chs]),
            "compressor": nn.ModuleDict({
                "g_a": nn.Sequential(
                    _conv(n, n), RefGDN(n), _conv(n, n), RefGDN(n),
                    _conv(n, n), RefGDN(n), _conv(n, m)),
                "h_a": nn.Sequential(
                    _conv(m, n, 3, 1), nn.ReLU(), _conv(n, n), nn.ReLU(),
                    _conv(n, n)),
                "h_s": nn.Sequential(
                    _deconv(n, n), nn.ReLU(), _deconv(n, n), nn.ReLU(),
                    _conv(n, m, 3, 1), nn.ReLU()),
            }),
            "output_heads": nn.ModuleList(
                [_upsample_plus_head(2 * self.cpt, c, len(in_chs), oc)
                 for oc in in_chs]),
        })
        self.loss_balancer = nn.ParameterDict(
            {"log_vars": nn.Parameter(torch.zeros(len(in_chs)))})

    @torch.no_grad()
    def forward_paths(self, xs):
        stacked = torch.cat([h(x) for h, x in
                             zip(self.model["input_heads"], xs)], dim=1)
        y = self.model["compressor"]["g_a"](stacked)
        y_hat = torch.round(y)
        c = self.cpt
        recs = []
        for t, head in enumerate(self.model["output_heads"]):
            v = torch.cat([y_hat[:, t * c:(t + 1) * c],
                           y_hat[:, -c:]], dim=1)
            recs.append(head(v))
        return y, recs


@pytest.fixture(scope="module")
def imported_shared():
    torch.manual_seed(3)
    tmodel = RefShapedSharedModel().eval()
    with torch.no_grad():
        for p in tmodel.parameters():
            p.add_(0.02 * torch.randn_like(p))

    jmodel = build_model(4, ["rgb", "mono"], latent_channels=9,
                         conv_channels=4)
    params = import_reference_state_dict(tmodel.state_dict(), jmodel)
    variables = jmodel.init(jax.random.PRNGKey(0),
                            jmodel.example_batch(image_size=256))
    merged = dict(variables["params"])
    for k, v in params.items():
        if k == "compressor":
            comp = dict(merged["compressor"])
            comp.update(v)
            merged["compressor"] = comp
        else:
            merged[k] = v
    return tmodel, jmodel, {"params": merged}


def test_shared_import_latents_and_reconstructions_match(imported_shared):
    tmodel, jmodel, variables = imported_shared
    rng = np.random.default_rng(7)
    x_rgb = rng.random((2, 256, 256, 3)).astype(np.float32)
    x_mono = rng.random((2, 256, 256, 1)).astype(np.float32)

    ty, trecs = tmodel.forward_paths(
        [torch.from_numpy(np.transpose(x_rgb, (0, 3, 1, 2))),
         torch.from_numpy(np.transpose(x_mono, (0, 3, 1, 2)))])

    batch = {"rgb": jnp.asarray(x_rgb), "mono": jnp.asarray(x_mono)}
    jy, _ = jmodel.net.apply(variables, batch,
                             method=type(jmodel.net).analyze)
    np.testing.assert_allclose(
        np.transpose(np.asarray(jy), (0, 3, 1, 2)), ty.numpy(),
        rtol=1e-3, atol=1e-4)

    jrecs = jmodel.decode_from_latents(variables, jnp.round(jy), None)
    for t, task in enumerate(["rgb", "mono"]):
        np.testing.assert_allclose(
            np.transpose(np.asarray(jrecs[task]), (0, 3, 1, 2)),
            trecs[t].numpy(), rtol=1e-3, atol=1e-4)


def test_shared_import_log_vars(imported_shared):
    tmodel, _, variables = imported_shared
    np.testing.assert_allclose(
        np.asarray(variables["params"]["log_vars"]),
        tmodel.loss_balancer["log_vars"].detach().numpy())

"""BERT fill-mask prompt debiasing + LPIPS
(reference prompt/prompt_processors.py:387-447, utils/metrics.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gsgen_tpu.prompt.bert import (BERT_BASE, TINY_BERT, BertForMaskedLM,
                                   load_bert_mlm)
from gsgen_tpu.prompt.debias import get_debiased_prompt


def test_bert_torch_oracle_parity():
    """Randomly-initialized transformers BertForMaskedLM -> flax via the
    rename table -> same logits."""
    torch = pytest.importorskip("torch")
    from transformers import BertConfig as HFBertConfig
    from transformers import BertForMaskedLM as HFBertForMaskedLM
    hf_cfg = HFBertConfig(
        vocab_size=TINY_BERT.vocab_size, hidden_size=TINY_BERT.hidden_size,
        num_hidden_layers=TINY_BERT.num_hidden_layers,
        num_attention_heads=TINY_BERT.num_attention_heads,
        intermediate_size=TINY_BERT.intermediate_size,
        max_position_embeddings=TINY_BERT.max_position_embeddings,
        hidden_act="gelu")
    torch.manual_seed(0)
    hf = HFBertForMaskedLM(hf_cfg).eval()
    module, params = load_bert_mlm(
        {k: v.numpy() for k, v in hf.state_dict().items()}, TINY_BERT)
    ids = np.array([[2, 5, 9, 3, 0, 0]], np.int32)
    mask = np.array([[1, 1, 1, 1, 0, 0]], bool)
    with torch.no_grad():
        want = hf(input_ids=torch.from_numpy(ids).long(),
                  attention_mask=torch.from_numpy(mask).long()).logits.numpy()
    got = np.asarray(module.apply(params, jnp.asarray(ids),
                                  jnp.asarray(mask)))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


def test_debias_pmi_logic():
    """Deterministic fill-mask probe: a word whose removal doesn't shift
    the view distribution gets dropped for that view; a word that does
    shift it is kept everywhere."""
    prompt = "red corgi standing"

    def fill_mask(texts):
        # full prompt -> uniform; dropping "red" (texts[1]) leaves the
        # distribution identical (PMI=1 -> but threshold is <0.95, so
        # pmi==1 keeps); dropping "corgi" (texts[2]) collapses the view
        # distribution -> pmi for view 0 shrinks below 0.95 -> drop.
        out = []
        for t in texts:
            if t == "red standing":            # "corgi" removed
                out.append(np.array([0.7, 0.1, 0.1, 0.1]))
            else:
                out.append(np.array([0.25, 0.25, 0.25, 0.25]))
        return np.stack(out)

    res = get_debiased_prompt(prompt, "", fill_mask=fill_mask)
    assert len(res) == 4
    # pmi(view0) for word "corgi": full 0.25 vs lerp(0.7,0.25,.5)=0.475
    # -> 0.526 < 0.95 -> "corgi" dropped from view 0 (side)
    assert res[0] == "red standing"
    # other views: pmi = .25/lerp(.1,.25,.5)=1.43 >= .95 -> kept
    assert res[1] == prompt and res[2] == prompt and res[3] == prompt


def test_debias_through_prompt_processor():
    from gsgen_tpu.prompt.processors import (PromptProcessor,
                                             PromptProcessorConfig)

    def fill_mask(texts):
        return np.tile(np.array([0.25, 0.25, 0.25, 0.25]), (len(texts), 1))

    cfg = PromptProcessorConfig(prompt="a corgi", use_cache=False,
                                use_prompt_debiasing=True)
    pp = PromptProcessor(cfg, fill_mask=fill_mask)
    emb = pp()
    assert emb.text_vd.shape[0] == 4


def test_lpips_properties():
    from gsgen_tpu.utils.metrics import init_lpips_params, lpips
    params = init_lpips_params()
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 64, 64, 3))
    y = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 3))
    same = float(lpips(x, x, params))
    diff = float(lpips(x, y, params))
    assert abs(same) < 1e-6
    assert diff > 1e-4
    # symmetric
    np.testing.assert_allclose(float(lpips(y, x, params)), diff, rtol=1e-5)


def test_lpips_matches_torch_lpips_structure():
    """Cross-check the jax LPIPS against an equivalent torch computation
    with the SAME random weights."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F
    from gsgen_tpu.utils.metrics import (_ALEX, _SCALE, _SHIFT,
                                         init_lpips_params, lpips)
    params = init_lpips_params()
    x = np.random.default_rng(0).uniform(size=(1, 33, 37, 3)).astype(np.float32)
    y = np.random.default_rng(1).uniform(size=(1, 33, 37, 3)).astype(np.float32)

    def torch_feats(img):
        h = torch.from_numpy(img * 2.0 - 1.0).permute(0, 3, 1, 2)
        h = (h - torch.from_numpy(_SHIFT).view(1, 3, 1, 1)) / \
            torch.from_numpy(_SCALE).view(1, 3, 1, 1)
        taps = []
        for (oc, k, s, p, mp), conv in zip(_ALEX, params["conv"]):
            if mp:
                h = F.max_pool2d(h, 3, 2)
            w = torch.from_numpy(
                np.transpose(np.asarray(conv["w"]), (3, 2, 0, 1)))
            h = F.conv2d(h, w, torch.from_numpy(np.asarray(conv["b"])),
                         stride=s, padding=p)
            h = F.relu(h)
            taps.append(h)
        return taps

    ta, tb = torch_feats(x), torch_feats(y)
    want = 0.0
    for fa, fb, lw in zip(ta, tb, params["lin"]):
        na = fa / fa.norm(dim=1, keepdim=True).clamp_min(1e-10)
        nb = fb / fb.norm(dim=1, keepdim=True).clamp_min(1e-10)
        d = (na - nb) ** 2
        lwt = torch.from_numpy(np.asarray(lw)).view(1, -1, 1, 1)
        want += (d * lwt).sum(dim=1).mean(dim=(1, 2))
    got = float(lpips(jnp.asarray(x), jnp.asarray(y), params))
    np.testing.assert_allclose(got, float(want), rtol=1e-4)


def test_metrics_bundle():
    from gsgen_tpu.utils.metrics import Metrics, init_lpips_params
    m = Metrics(lpips_params=init_lpips_params())
    x = jax.random.uniform(jax.random.PRNGKey(0), (64, 64, 3))
    out = m(x, jnp.clip(x + 0.05, 0, 1))
    assert set(out) == {"psnr", "ssim", "lpips"}
    assert all(np.isfinite(float(v)) for v in out.values())

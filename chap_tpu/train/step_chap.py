"""The CHAP semi-supervised train step — one jitted XLA program.

Rebuild of the reference hot loop (train_ours_2D.py:302-405, SURVEY.md §3.1):
teacher pass, largest-CC pseudo-label cleanup, BCP mixing, 4x mixed
supervision, gradient-similarity channel-dropout consistency, and VAT
adversarial consistency — all traced into a single step function. The
reference's eager multi-pass python (separate no_grad pass, extra
forward+backward for GradSim, K VAT power-iteration passes, optimizer
bookkeeping) collapses into one compiled graph per step with NO host
round-trips at all — even the largest-CC NMS runs on-device
(chap_tpu.semi.nms), where the reference syncs every step through the CPU
(train_ours_2D.py:114-136).

Semantics notes (reconstructed where the reference's utils.losses is missing):
  * VAT runs on the unlabeled half ``uimg_ab`` against the clean teacher soft
    predictions, gated by the top-k disagreement mask (the reference passes
    the full 24-batch to VAT2d while its soft targets/mask are 12-batch — the
    unlabeled-batch reading is the only shape-consistent one).
  * GradSim's two extra gradients (labeled-vs-unlabeled loss) are pulled from
    ONE shared linearization via jax.vjp instead of two more eager backwards.
"""
from __future__ import annotations

from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp

from chap_tpu.config import Config
from chap_tpu.losses.ce import cross_entropy, cross_entropy_per_pixel
from chap_tpu.losses.mix import mix_loss
from chap_tpu.losses.vat import vat_direction, vat_divergence, vat_loss_2d
from chap_tpu.semi.bcp import generate_mask_nd, mix_images
from chap_tpu.semi.gradsim import ENCODER_LEVEL_PATHS, update_grad_sim
from chap_tpu.semi.nms import largest_cc_batch
from chap_tpu.semi.patchmask import create_mask_v1
from chap_tpu.train.state import TrainState
from chap_tpu.utils.ramps import sigmoid_rampup

# every BatchNorm in the zoo uses momentum 0.9 (models/layers.py:70); the
# fused-pass running-stat reconstruction below depends on it
BN_MOMENTUM = 0.9


class StepOutput(NamedTuple):
    state: TrainState
    metrics: Dict[str, jnp.ndarray]


def build_chap_train_step(model, optimizer, cfg: Config, use_nms: bool = True,
                          level_paths=ENCODER_LEVEL_PATHS,
                          split: bool = False):
    """Returns step(state, batch, rng) -> StepOutput, jit-compiled.

    batch: {'image': [B, *spatial, 1] float, 'label': [B, *spatial] int} with
    the two-stream layout [labeled_bs labeled ; B-labeled_bs unlabeled].
    Rank-generic: [B,H,W,1] for the 2D trainer, [B,D,H,W,1] for the 3D one
    (every semi primitive — BCP mask, top-k patch mask, on-device largest-CC,
    VAT, channel perturbation — is rank-generic).

    level_paths: param-tree paths of the per-level encoder kernels for
    GradSim (ENCODER_LEVEL_PATHS for the 2D UNet family, VNET_LEVEL_PATHS for
    the VNet 3D family).

    split: compile the step as TWO jitted programs — teacher+NMS producing
    pseudo-labels / student update consuming them — instead of one fused
    graph. Semantically identical (both modes call the same teacher_fn /
    student_fn; the RNG is re-split deterministically in each program), two
    dispatches instead of one. Exists because the tunnel-attached remote
    XLA compiler is OOM-killed compiling the FUSED full-CHAP 3D graph at the
    LA patch (112,112,80) — halving compiler peak memory lets the full
    method train at the reference's flagship patch (test_LA.py:14-24).
    """
    num_classes = cfg.data.num_classes
    labeled_bs = cfg.data.labeled_bs
    if labeled_bs < 2 or labeled_bs % 2:
        # the BCP protocol pairs labeled halves a/b (train_ours_2D.py:311-318)
        # — labeled_bs // 2 == 0 would silently slice empty sub-batches and
        # fail deep inside the loss with an unrelated shape error
        raise ValueError(
            f"CHAP two-stream step needs an even labeled_bs >= 2 "
            f"(got labeled_bs={labeled_bs}, batch_size={cfg.data.batch_size}); "
            f"the BCP mixing splits the labeled half into a/b pairs")
    sub_bs = labeled_bs // 2
    semi = cfg.semi

    def apply_model(params, batch_stats, x, rng=None, train=True, mutable=True,
                    remat=False, **kwargs):
        def inner(params, batch_stats, x, rng):
            variables = {"params": params, "batch_stats": batch_stats}
            rngs = {}
            if rng is not None:
                r_drop, r_pert = jax.random.split(rng)
                rngs = {"dropout": r_drop, "perturb": r_pert}
            if mutable:
                (o1, o2), updates = model.apply(variables, x, train=train,
                                                mutable=["batch_stats"],
                                                rngs=rngs, **kwargs)
                return o1, o2, updates["batch_stats"]
            return model.apply(variables, x, train=train, rngs=rngs, **kwargs)

        if remat:
            # the CHAP step runs 4+ forward passes before one backward;
            # checkpointing each pass keeps only ONE pass's activations live
            # during the backward instead of all of them
            inner = jax.checkpoint(inner)
        return inner(params, batch_stats, x, rng)

    def teacher_fn(params, batch_stats, image: jnp.ndarray, rng: jax.Array
                   ) -> Dict[str, jnp.ndarray]:
        """No-grad teacher pass + largest-CC NMS -> pseudo-label bundle."""
        r_teacher = jax.random.split(rng, 5)[0]
        uimg_ab = image[labeled_bs:]

        pre_ab1, pre_ab2, bs1 = apply_model(
            jax.lax.stop_gradient(params), batch_stats, uimg_ab,
            rng=r_teacher)
        pre_ab1 = jax.lax.stop_gradient(pre_ab1)
        pre_ab2 = jax.lax.stop_gradient(pre_ab2)
        soft1 = jax.nn.softmax(pre_ab1, axis=-1)
        soft2 = jax.nn.softmax(pre_ab2, axis=-1)
        pseudo1 = jnp.argmax(soft1, axis=-1).astype(jnp.int32)
        pseudo2 = jnp.argmax(soft2, axis=-1).astype(jnp.int32)
        knowledge = (cross_entropy_per_pixel(pre_ab1, pseudo2)
                     + cross_entropy_per_pixel(pre_ab2, pseudo1))

        # largest-CC cleanup of all 4 pseudo chunks ON DEVICE, as ONE
        # batched labeling (chap_tpu.semi.nms) — no host round-trip
        pseudo_all = jnp.concatenate([
            jnp.argmax(pre_ab1[:sub_bs], -1), jnp.argmax(pre_ab1[sub_bs:], -1),
            jnp.argmax(pre_ab2[:sub_bs], -1), jnp.argmax(pre_ab2[sub_bs:], -1),
        ]).astype(jnp.int32)
        if use_nms:
            pseudo_all = largest_cc_batch(pseudo_all, num_classes)
        return {"soft1": soft1, "soft2": soft2,
                "pseudo1": pseudo1, "pseudo2": pseudo2,
                "knowledge": knowledge, "pseudo_all": pseudo_all,
                "batch_stats": bs1}

    def student_fn(state: TrainState, batch: Dict[str, jnp.ndarray],
                   rng: jax.Array, teacher: Dict[str, jnp.ndarray]
                   ) -> StepOutput:
        # labels may arrive uint8 (compact host->device transfer,
        # data/pipeline.compact_batch) — widen once on device
        image = batch["image"]
        label = batch["label"].astype(jnp.int32)
        _, r_mask, r_student, r_fp, r_vat = jax.random.split(rng, 5)

        img_a, img_b = image[:sub_bs], image[sub_bs:labeled_bs]
        uimg_a = image[labeled_bs:labeled_bs + sub_bs]
        uimg_b = image[labeled_bs + sub_bs:]
        lab_a, lab_b = label[:sub_bs], label[sub_bs:labeled_bs]
        uimg_ab = jnp.concatenate([uimg_a, uimg_b])

        soft1, soft2 = teacher["soft1"], teacher["soft2"]
        pseudo1, pseudo2 = teacher["pseudo1"], teacher["pseudo2"]
        knowledge = teacher["knowledge"]
        pseudo_all = teacher["pseudo_all"]
        bs1 = teacher["batch_stats"]
        plab_a1 = pseudo_all[:sub_bs]
        plab_b1 = pseudo_all[sub_bs:2 * sub_bs]
        plab_a2 = pseudo_all[2 * sub_bs:3 * sub_bs]
        plab_b2 = pseudo_all[3 * sub_bs:]

        # ---- BCP mixing ----------------------------------------------------
        spatial = image.shape[1:-1]
        img_mask = generate_mask_nd(r_mask, spatial)         # [*spatial] {0,1}
        loss_mask = jnp.broadcast_to(img_mask[None], (sub_bs, *spatial))
        net_input_unl = mix_images(uimg_a, img_a, img_mask)
        net_input_l = mix_images(img_b, uimg_b, img_mask)
        net_input_mix = jnp.concatenate([net_input_l, net_input_unl])

        consistency_weight = semi.consistency * sigmoid_rampup(
            state.step // 150, semi.consistency_rampup)

        # ---- differentiated losses ----------------------------------------
        remat = cfg.optim.remat
        # fused mode: the student-mix, channel-dropout and VAT-adversarial
        # forwards run as ONE vmapped apply (3x conv batch; per-instance BN
        # stats under vmap = separate-pass stats) and ONE backward with all
        # loss cotangents live. Requires equal per-pass batch rows (the
        # standard labeled_bs = batch/2 layout) and an active extra branch.
        fused = (cfg.optim.fused_passes
                 and (semi.dropout or semi.adv_noise)
                 and net_input_mix.shape[0] == uimg_ab.shape[0])

        if semi.adv_noise:
            diff_mask = create_mask_v1(pseudo1, pseudo2, knowledge,
                                       scale_factor=4, topk=semi.topk1)
        if fused and semi.adv_noise:
            # power iteration BEFORE the main vjp: it needs only the teacher
            # targets, carries no parameter gradient (d is stop-gradient),
            # and train-mode BN output is independent of input running stats
            def power_apply(x):
                o1, o2, _ = apply_model(jax.lax.stop_gradient(state.params),
                                        bs1, x, rng=r_vat, remat=remat)
                return o1, o2

            d_adv = vat_direction(power_apply, uimg_ab, soft1, soft2,
                                  diff_mask, r_vat, xi=semi.noise_mag,
                                  losstype=semi.adv_losstype)

        def mix_losses(out_mix1, out_mix2):
            out_l1, out_unl1 = out_mix1[:sub_bs], out_mix1[sub_bs:]
            out_l2, out_unl2 = out_mix2[:sub_bs], out_mix2[sub_bs:]
            lu_out1, ll_in1, m1 = mix_loss(out_unl1, plab_a2, lab_a, loss_mask,
                                           num_classes, u_weight=0.5, unlab=True)
            lu_out2, ll_in2, m2 = mix_loss(out_unl2, plab_a1, lab_a, loss_mask,
                                           num_classes, u_weight=0.5, unlab=True)
            ll_out1, lu_in1, m3 = mix_loss(out_l1, lab_b, plab_b2, loss_mask,
                                           num_classes, u_weight=0.5)
            ll_out2, lu_in2, m4 = mix_loss(out_l2, lab_b, plab_b1, loss_mask,
                                           num_classes, u_weight=0.5)
            bcp_loss = m1 + m2 + m3 + m4
            loss_l = ll_in1 + ll_in2 + ll_out1 + ll_out2
            loss_u = lu_in1 + lu_in2 + lu_out1 + lu_out2
            return bcp_loss, loss_l, loss_u

        def losses_fused(params):
            xs, keys, gates = [net_input_mix], [r_student], [0.0]
            if semi.dropout:
                xs.append(uimg_ab)
                keys.append(r_fp)
                gates.append(1.0)
            if semi.adv_noise:
                xs.append(uimg_ab + semi.adv_epi * d_adv)
                keys.append(r_vat)
                gates.append(0.0)
            perturb_kwargs = dict(
                dropout_level=(0, 1, 2, 3, 4), scores=list(state.sim_scores),
                comp_dropout=semi.comp_drop) if semi.dropout else {}

            def one(x, key, gate):
                kw = dict(perturb_kwargs)
                if semi.dropout:
                    kw["perturb_gate"] = gate
                return apply_model(params, bs1, x, rng=key, remat=remat, **kw)

            o1s, o2s, statss = jax.vmap(one)(
                jnp.stack(xs), jnp.stack(keys),
                jnp.asarray(gates, net_input_mix.dtype))

            bcp_loss, loss_l, loss_u = mix_losses(o1s[0], o2s[0])
            # exact sequential running-stat reconstruction: separate passes
            # produce bs2 = m*bs1 + (1-m)*mu_A then bs3 = m*bs2 + (1-m)*mu_B;
            # the fused instances give s_i = m*bs1 + (1-m)*mu_i, so
            # bs2 = s_A and bs3 = m*s_A + (s_B - m*bs1)
            s_a = jax.tree.map(lambda u: u[0], statss)
            if semi.dropout:
                s_b = jax.tree.map(lambda u: u[1], statss)
                bs_final = jax.tree.map(
                    lambda a, b, o: BN_MOMENTUM * a + b - BN_MOMENTUM * o,
                    s_a, s_b, bs1)
                fp_loss = (cross_entropy(o1s[1], pseudo2)
                           + cross_entropy(o2s[1], pseudo1))
            else:
                bs_final = s_a
                fp_loss = jnp.zeros(())
            if semi.adv_noise:
                vat = vat_divergence(o1s[-1], o2s[-1], soft1, soft2,
                                     diff_mask, semi.adv_losstype)
            else:
                vat = jnp.zeros(())

            total = bcp_loss + consistency_weight * (
                semi.w_drop * fp_loss + semi.w_adv * vat)
            aux = {"batch_stats": bs_final, "bcp_loss": bcp_loss,
                   "loss_l": loss_l, "loss_u": loss_u, "fp_loss": fp_loss,
                   "vat_loss": vat}
            return jnp.stack([total, loss_l, loss_u]), aux

        def losses_sequential(params):
            out_mix1, out_mix2, bs2 = apply_model(params, bs1, net_input_mix,
                                                  rng=r_student, remat=remat)
            bcp_loss, loss_l, loss_u = mix_losses(out_mix1, out_mix2)

            bs_final = bs2
            if semi.dropout:
                # channel-dropout consistency on the unlabeled batch
                fp1, fp2, bs3 = apply_model(
                    params, bs2, uimg_ab, rng=r_fp, remat=remat,
                    dropout_level=(0, 1, 2, 3, 4),
                    scores=list(state.sim_scores),
                    comp_dropout=semi.comp_drop)
                fp_loss = (cross_entropy(fp1, pseudo2)
                           + cross_entropy(fp2, pseudo1))
                bs_final = bs3
            else:
                fp_loss = jnp.zeros(())

            if semi.adv_noise:
                def vat_apply(x):
                    # train-mode BN like the reference's perturbed passes;
                    # running-stat updates from VAT passes are discarded
                    o1, o2, _ = apply_model(params, bs_final, x, rng=r_vat,
                                            remat=remat)
                    return o1, o2

                vat = vat_loss_2d(
                    vat_apply,
                    uimg_ab, soft1, soft2, diff_mask, r_vat,
                    xi=semi.noise_mag, epi=semi.adv_epi,
                    losstype=semi.adv_losstype)
            else:
                vat = jnp.zeros(())

            total = bcp_loss + consistency_weight * (
                semi.w_drop * fp_loss + semi.w_adv * vat)
            aux = {"batch_stats": bs_final, "bcp_loss": bcp_loss,
                   "loss_l": loss_l, "loss_u": loss_u, "fp_loss": fp_loss,
                   "vat_loss": vat}
            return jnp.stack([total, loss_l, loss_u]), aux

        losses_fn = losses_fused if fused else losses_sequential
        vals, pullback, aux = jax.vjp(losses_fn, state.params, has_aux=True)
        grads = pullback(jnp.array([1.0, 0.0, 0.0], vals.dtype))[0]

        sim_scores = state.sim_scores
        if semi.dropout:
            # separate pullback calls (NOT one vmapped batched backward): the
            # labeled/unlabeled gradients are consumed only at the 5 encoder
            # kernels (update_grad_sim), so XLA dead-code-eliminates every
            # other weight-gradient kernel of these two backwards — a batched
            # backward would have to compute all of them
            every = max(1, int(semi.gradsim_every))

            def compute_scores(_):
                grads_l = pullback(jnp.array([0.0, 1.0, 0.0], vals.dtype))[0]
                grads_u = pullback(jnp.array([0.0, 0.0, 1.0], vals.dtype))[0]
                # EMA decay adjusted to decay**N so the averaging horizon
                # matches the reference's per-step update at any cadence
                return update_grad_sim(sim_scores, grads_l, grads_u,
                                       decay=0.9 ** every, paths=level_paths)

            if every == 1:
                sim_scores = compute_scores(None)
            else:
                sim_scores = jax.lax.cond(
                    state.step % every == 0, compute_scores,
                    lambda _: tuple(sim_scores), None)

        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = jax.tree.map(lambda p, u: p + u, state.params, updates)

        new_state = state.replace(
            step=state.step + 1,
            params=params,
            batch_stats=aux["batch_stats"],
            opt_state=opt_state,
            sim_scores=sim_scores,
        )
        metrics = {
            "loss": vals[0],
            "bcp_loss": aux["bcp_loss"],
            "loss_l": aux["loss_l"],
            "loss_u": aux["loss_u"],
            "fp_loss": aux["fp_loss"],
            "vat_loss": aux["vat_loss"],
            "consistency_weight": consistency_weight,
        }
        return StepOutput(new_state, metrics)

    if split:
        # two programs: the teacher never donates (reads params/stats only);
        # the student donates the state like the fused step. The RNG is
        # re-split identically in both programs, so the split and fused
        # modes are numerically the same step (tests/test_step_chap_split.py).
        teacher_jit = jax.jit(teacher_fn)
        student_jit = jax.jit(student_fn, donate_argnums=(0,))

        def step_split(state: TrainState, batch: Dict[str, jnp.ndarray],
                       rng: jax.Array) -> StepOutput:
            teacher = teacher_jit(state.params, state.batch_stats,
                                  batch["image"], rng)
            return student_jit(state, batch, rng, teacher)

        step_split.teacher = teacher_jit   # exposed for compile diagnostics
        step_split.student = student_jit
        return step_split

    def step(state: TrainState, batch: Dict[str, jnp.ndarray], rng: jax.Array
             ) -> StepOutput:
        teacher = teacher_fn(state.params, state.batch_stats, batch["image"],
                             rng)
        return student_fn(state, batch, rng, teacher)

    return jax.jit(step, donate_argnums=(0,))

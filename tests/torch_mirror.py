"""Torch mirror of the full GLASS model with exact d2/GLASS module names.

Composes every module of the reference model (reference
``glass/modeling/**`` + detectron2's GeneralizedRCNN/FPN/RPN/ROI heads)
in plain torch with the precise attribute names their released
``DetectionCheckpointer`` state dicts use.  ``TorchGlassModel.state_dict()``
is therefore shaped exactly like a real released ``.pth`` — the
checkpoint-fidelity and stage-parity tests in
``tests/test_full_model_parity.py`` run it through
``glass_tpu.train.checkpoint`` to prove the converter's renames are right
before real weights ever arrive.

Name sources (reference file:line):
- backbone/FPN: d2 ``build_resnet_fpn_backbone`` (``fpn_lateral{2..5}``,
  ``fpn_output{2..5}``, ``bottom_up.stem/res{2..5}``, norm=SyncBN per
  ``configs/glass_pretrain.yaml:50``).
- proposal_generator.rpn_head: d2 ``StandardRPNHead``
  (``conv``/``objectness_logits``/``anchor_deltas``).
- roi_heads.box_head: d2 ``FastRCNNConvFCHead`` (``fc1``/``fc2``).
- roi_heads.box_predictor: ``rotated_fast_rcnn.py:494-638``
  (``cls_score``/``bbox_pred``/``orientation_pred``).
- roi_heads.mask_head: d2 ``MaskRCNNConvUpsampleHead``
  (``mask_fcn{i}``/``deconv``/``predictor``).
- roi_heads.{recognizer_feature_fusion,hybrid_net,fusion_net,
  recognizer_head}: ``recognizers_hybrid_head.py:100-112``.
- recognizer chain: ``recognizer_head_v2.py:190-207`` (``backbone``,
  ``encoder``, ``decoder``), ``recognizer_encoder.py:101-144``
  (``bilsm_stack.{i}.rnn/linear``), ``recognizer_decoder.py:65-75`` +
  ``prediction_aster.py:225-302``
  (``decoder.recognizer.decoder.{attention_unit.{sEmbed,xEmbed,wEmbed},
  tgt_embedding,gru,fc,temperature}``).
"""

import torch
import torch.nn as nn
import torch.nn.functional as F


def conv_norm(cin, cout, k, stride=1, pad=0):
    c = nn.Conv2d(cin, cout, k, stride, pad, bias=False)
    c.norm = nn.BatchNorm2d(cout)
    return c


def randomize_bn_stats(module):
    """Give every BN nontrivial running stats so eval-mode forward is a real
    normalization test, not an identity."""
    with torch.no_grad():
        for m in module.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.copy_(torch.randn_like(m.running_mean) * 0.1)
                m.running_var.copy_(torch.rand_like(m.running_var) + 0.5)


# ---------------------------------------------------------------------------
# Backbone: ResNet-50 bottom_up + FPN (d2 naming), width-scalable
# ---------------------------------------------------------------------------

# (stage name, n blocks, mid/64, out/64, first stride) — R50 plan.
R50_PLAN = [("res2", 3, 1, 4, 1), ("res3", 4, 2, 8, 2),
            ("res4", 6, 4, 16, 2), ("res5", 3, 8, 32, 2)]


class Bottleneck(nn.Module):
    def __init__(self, cin, mid, cout, stride):
        super().__init__()
        self.conv1 = conv_norm(cin, mid, 1, stride)  # d2 stride_in_1x1
        self.conv2 = conv_norm(mid, mid, 3, 1, 1)
        self.conv3 = conv_norm(mid, cout, 1)
        if stride != 1 or cin != cout:
            self.shortcut = conv_norm(cin, cout, 1, stride)

    def forward(self, x):
        out = torch.relu(self.conv1.norm(self.conv1(x)))
        out = torch.relu(self.conv2.norm(self.conv2(out)))
        out = self.conv3.norm(self.conv3(out))
        sc = self.shortcut.norm(self.shortcut(x)) if hasattr(self, "shortcut") else x
        return torch.relu(out + sc)


class TorchBottomUp(nn.Module):
    def __init__(self, width=64):
        super().__init__()
        stem = nn.Module()
        stem.conv1 = conv_norm(3, width, 7, 2, 3)
        self.stem = stem
        cin = width
        for name, n_blocks, mid, cout, stride in R50_PLAN:
            mid_s, cout_s = mid * width, cout * width
            blocks = nn.Sequential(*[
                Bottleneck(cin if i == 0 else cout_s, mid_s, cout_s,
                           stride if i == 0 else 1)
                for i in range(n_blocks)
            ])
            setattr(self, name, blocks)
            cin = cout_s

    def forward(self, x):
        x = torch.relu(self.stem.conv1.norm(self.stem.conv1(x)))
        x = torch.max_pool2d(x, 3, 2, 1)
        feats = {}
        for name, *_ in R50_PLAN:
            x = getattr(self, name)(x)
            feats[name] = x
        return feats


class TorchBackboneFPN(nn.Module):
    """d2 FPN with NORM=SyncBN (lateral/output convs have attached norm)."""

    def __init__(self, width=64, fpn_ch=256):
        super().__init__()
        self.bottom_up = TorchBottomUp(width)
        for i, (name, _, _, cout, _) in enumerate(R50_PLAN, start=2):
            setattr(self, f"fpn_lateral{i}", conv_norm(cout * width, fpn_ch, 1))
            setattr(self, f"fpn_output{i}", conv_norm(fpn_ch, fpn_ch, 3, 1, 1))

    def forward(self, x):
        feats = self.bottom_up(x)
        lat = {}
        for i, (name, *_a) in enumerate(R50_PLAN, start=2):
            m = getattr(self, f"fpn_lateral{i}")
            lat[name] = m.norm(m(feats[name]))
        merged = {"res5": lat["res5"]}
        for prev, cur in (("res5", "res4"), ("res4", "res3"), ("res3", "res2")):
            up = F.interpolate(merged[prev], scale_factor=2, mode="nearest")
            merged[cur] = lat[cur] + up[:, :, : lat[cur].shape[2], : lat[cur].shape[3]]
        out = {}
        for i, (name, *_a) in enumerate(R50_PLAN, start=2):
            m = getattr(self, f"fpn_output{i}")
            out[f"p{i}"] = m.norm(m(merged[name]))
        out["p6"] = torch.max_pool2d(out["p5"], 1, 2)
        return out


# ---------------------------------------------------------------------------
# RPN head (d2 StandardRPNHead)
# ---------------------------------------------------------------------------


class TorchRPNHead(nn.Module):
    def __init__(self, ch, num_anchors, box_dim=5):
        super().__init__()
        self.conv = nn.Conv2d(ch, ch, 3, padding=1)
        self.objectness_logits = nn.Conv2d(ch, num_anchors, 1)
        self.anchor_deltas = nn.Conv2d(ch, num_anchors * box_dim, 1)

    def forward(self, features):
        logits, deltas = [], []
        for f in features:
            t = torch.relu(self.conv(f))
            logits.append(self.objectness_logits(t))
            deltas.append(self.anchor_deltas(t))
        return logits, deltas


# ---------------------------------------------------------------------------
# Box head + predictor
# ---------------------------------------------------------------------------


class TorchBoxHead(nn.Module):
    def __init__(self, input_size, fc_dim):
        super().__init__()
        self.fc1 = nn.Linear(input_size, fc_dim)
        self.fc2 = nn.Linear(fc_dim, fc_dim)

    def forward(self, x):  # x: (R, C, ph, pw)
        x = torch.flatten(x, start_dim=1)
        x = torch.relu(self.fc1(x))
        return torch.relu(self.fc2(x))


class TorchBoxPredictor(nn.Module):
    def __init__(self, input_size, num_classes=1, orientation_on=True):
        super().__init__()
        self.cls_score = nn.Linear(input_size, num_classes + 1)
        self.bbox_pred = nn.Linear(input_size, num_classes * 5)
        if orientation_on:
            self.orientation_pred = nn.Linear(input_size, 4)

    def forward(self, x):
        orient = self.orientation_pred(x) if hasattr(self, "orientation_pred") else None
        return self.cls_score(x), self.bbox_pred(x), orient


# ---------------------------------------------------------------------------
# Mask head (d2 MaskRCNNConvUpsampleHead, norm='')
# ---------------------------------------------------------------------------


class TorchMaskHead(nn.Module):
    def __init__(self, ch, num_conv=4, num_classes=1):
        super().__init__()
        self.num_conv = num_conv
        for i in range(num_conv):
            self.add_module(f"mask_fcn{i + 1}", nn.Conv2d(ch, ch, 3, padding=1))
        self.deconv = nn.ConvTranspose2d(ch, ch, 2, 2)
        self.predictor = nn.Conv2d(ch, num_classes, 1)

    def forward(self, x):
        for i in range(self.num_conv):
            x = torch.relu(getattr(self, f"mask_fcn{i + 1}")(x))
        x = torch.relu(self.deconv(x))
        return self.predictor(x)


# ---------------------------------------------------------------------------
# P2P3Fusion (fusion_modules.py:250-286)
# ---------------------------------------------------------------------------


class TorchP2P3Fusion(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.conv1 = nn.Conv2d(ch, ch, 1, bias=False)
        self.conv2 = nn.Conv2d(ch, ch, 1, bias=False)

    def forward(self, p2, p3):
        x1 = self.conv1(p2)
        x2 = F.interpolate(self.conv2(p3), scale_factor=2, mode="nearest")
        return x1 + x2[:, :, : x1.shape[2], : x1.shape[3]]


# ---------------------------------------------------------------------------
# GC attention fusion (fusion_modules.py:22-157, channel_add)
# ---------------------------------------------------------------------------


class TorchGCAttention(nn.Module):
    def __init__(self, inplanes=512, ratio=0.5, headers=8, outplane=256):
        super().__init__()
        self.headers = headers
        self.single = inplanes // headers
        planes = int(inplanes * ratio)
        self.conv_mask = nn.Conv2d(self.single, 1, 1)
        self.channel_add_conv = nn.Sequential(
            nn.Conv2d(inplanes, planes, 1),
            nn.LayerNorm([planes, 1, 1]),
            nn.ReLU(),
            nn.Conv2d(planes, inplanes, 1),
        )
        self.out = nn.Conv2d(inplanes, outplane, 3, padding=1)
        order = torch.zeros(inplanes, dtype=torch.long)
        order[0::2] = torch.arange(inplanes)[: inplanes // 2]
        order[1::2] = torch.arange(inplanes)[inplanes // 2:]
        self.order = order  # plain attribute: absent from state_dict, as in d2

    def forward(self, x):
        x = x[:, self.order]
        n, c, h, w = x.shape
        xh = x.reshape(n * self.headers, self.single, h * w)
        mask = self.conv_mask(x.reshape(n * self.headers, self.single, h, w))
        mask = torch.softmax(mask.reshape(n * self.headers, 1, h * w), dim=2)
        context = torch.matmul(xh.unsqueeze(1), mask.unsqueeze(-1)).reshape(n, c, 1, 1)
        out = x + self.channel_add_conv(context)
        return self.out(out)


# ---------------------------------------------------------------------------
# Local feature extractor (local_feature_extraction.py:22-115, ResNet [1,2,5,3])
# ---------------------------------------------------------------------------


class TorchLocalBasicBlock(nn.Module):
    def __init__(self, cin, cout, downsample=False):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, cout, 3, padding=1, bias=False)
        self.bn1 = nn.BatchNorm2d(cout)
        self.conv2 = nn.Conv2d(cout, cout, 3, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(cout)
        self.downsample = (
            nn.Sequential(nn.Conv2d(cin, cout, 1, bias=False), nn.BatchNorm2d(cout))
            if downsample else None
        )

    def forward(self, x):
        out = torch.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        res = self.downsample(x) if self.downsample is not None else x
        return torch.relu(out + res)


class TorchLocalCNN(nn.Module):
    """The ``ResNet`` inside ``ResNetFeatureExtractor`` (out=256 plan scaled
    by ``out``)."""

    def __init__(self, out=256, layers=(1, 2, 5, 3)):
        super().__init__()
        block_ch = [out // 4, out // 2, out, out]
        inpl = out // 8

        def stage(cin, cout, n):
            mods = [TorchLocalBasicBlock(cin, cout, cin != cout)]
            mods += [TorchLocalBasicBlock(cout, cout) for _ in range(n - 1)]
            return nn.Sequential(*mods)

        self.conv0_1 = nn.Conv2d(3, out // 16, 3, padding=1, bias=False)
        self.bn0_1 = nn.BatchNorm2d(out // 16)
        self.conv0_2 = nn.Conv2d(out // 16, inpl, 3, padding=1, bias=False)
        self.bn0_2 = nn.BatchNorm2d(inpl)
        self.maxpool1 = nn.MaxPool2d(2, 2)
        self.layer1 = stage(inpl, block_ch[0], layers[0])
        self.conv1 = nn.Conv2d(block_ch[0], block_ch[0], 3, padding=1, bias=False)
        self.bn1 = nn.BatchNorm2d(block_ch[0])
        self.maxpool2 = nn.MaxPool2d(2, 2)
        self.layer2 = stage(block_ch[0], block_ch[1], layers[1])
        self.conv2 = nn.Conv2d(block_ch[1], block_ch[1], 3, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(block_ch[1])
        self.maxpool3 = nn.MaxPool2d(2, (2, 1), (0, 1))
        self.layer3 = stage(block_ch[1], block_ch[2], layers[2])
        self.conv3 = nn.Conv2d(block_ch[2], block_ch[2], 3, padding=1, bias=False)
        self.bn3 = nn.BatchNorm2d(block_ch[2])
        self.layer4 = stage(block_ch[2], block_ch[3], layers[3])
        self.conv4_1 = nn.Conv2d(block_ch[3], block_ch[3], 2, (2, 1), bias=False)
        self.bn4_1 = nn.BatchNorm2d(block_ch[3])

    def forward(self, x):
        x = torch.relu(self.bn0_1(self.conv0_1(x)))
        x = torch.relu(self.bn0_2(self.conv0_2(x)))
        x = self.maxpool1(x)
        x = self.layer1(x)
        x = torch.relu(self.bn1(self.conv1(x)))
        x = self.maxpool2(x)
        x = self.layer2(x)
        x = torch.relu(self.bn2(self.conv2(x)))
        x = self.maxpool3(x)
        x = self.layer3(x)
        x = torch.relu(self.bn3(self.conv3(x)))
        x = self.layer4(x)
        return torch.relu(self.bn4_1(self.conv4_1(x)))


class TorchHybridNet(nn.Module):
    """``ResNetFeatureExtractor`` wrapper: the child is named ``ConvNet``."""

    def __init__(self, out=256):
        super().__init__()
        self.ConvNet = TorchLocalCNN(out)

    def forward(self, x):
        return self.ConvNet(x)


# ---------------------------------------------------------------------------
# Recognizer chain
# ---------------------------------------------------------------------------


class TorchCNN_V1_1(nn.Module):
    """recognizer_backbone.py:34-81 (d2 Conv2d applies norm then activation)."""

    def __init__(self, ch):
        super().__init__()
        self.conv1 = conv_norm(ch, ch, (2, 1), (2, 1), 0)
        self.conv2 = conv_norm(ch, ch, 3, 1, 1)

    def forward(self, x):
        x1 = torch.relu(self.conv1.norm(self.conv1(x)))
        x2 = torch.relu(self.conv2.norm(self.conv2(x1)))
        return x2 + x1


class TorchBiLSTM(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.rnn = nn.LSTM(ch, ch, bidirectional=True, batch_first=True)
        self.linear = nn.Linear(2 * ch, ch)

    def forward(self, x):
        rec, _ = self.rnn(x)
        return self.linear(rec)


class TorchRecognizerEncoder(nn.Module):
    """BiLSTMBlockV2 (recognizer_encoder.py:101-144)."""

    def __init__(self, ch, num_layers=2):
        super().__init__()
        self.bilsm_stack = nn.Sequential(*[TorchBiLSTM(ch) for _ in range(num_layers)])

    def forward(self, x):  # x: (N, C, H, W)
        x = x.mean(dim=2).transpose(1, 2).contiguous()
        return self.bilsm_stack(x)


class TorchAttentionUnit(nn.Module):
    def __init__(self, sDim, xDim, attDim):
        super().__init__()
        self.sEmbed = nn.Linear(sDim, attDim)
        self.xEmbed = nn.Linear(xDim, attDim)
        self.wEmbed = nn.Linear(attDim, 1)

    def forward(self, x, sPrev):
        b, t, _ = x.shape
        xProj = self.xEmbed(x)
        sProj = self.sEmbed(sPrev.squeeze(0)).unsqueeze(1)
        v = self.wEmbed(torch.tanh(sProj + xProj)).reshape(b, t)
        return torch.softmax(v, dim=1)


class TorchDecoderUnit(nn.Module):
    def __init__(self, sDim, xDim, yDim, attDim):
        super().__init__()
        self.attention_unit = TorchAttentionUnit(sDim, xDim, attDim)
        self.tgt_embedding = nn.Embedding(yDim, attDim)
        self.gru = nn.GRU(input_size=xDim + attDim, hidden_size=sDim, batch_first=True)
        self.fc = nn.Linear(sDim, yDim)
        self.temperature = nn.Parameter(torch.ones(1), requires_grad=False)

    def forward(self, x, sPrev, yPrev):
        alpha = self.attention_unit(x, sPrev)
        context = torch.bmm(alpha.unsqueeze(1), x).squeeze(1)
        yProj = self.tgt_embedding(yPrev.long())
        output, state = self.gru(torch.cat([yProj, context], 1).unsqueeze(1), sPrev)
        output = self.fc(output.squeeze(1)) * self.temperature
        return output, state, alpha


class TorchAttentionRecognitionHead(nn.Module):
    """prediction_aster.py:14-99 — the child is named ``decoder``."""

    def __init__(self, num_classes, in_planes, sDim, attDim):
        super().__init__()
        self.sDim = sDim
        self.num_classes = num_classes
        self.decoder = TorchDecoderUnit(sDim, in_planes, num_classes, attDim)

    def sample(self, x, lengths, eos=0):
        """Greedy decode with the reference's batch-global early exit."""
        b = x.size(0)
        state = torch.zeros(1, b, self.sDim, dtype=x.dtype)
        outputs_ = torch.zeros(b, lengths, self.num_classes, dtype=x.dtype)
        outputs = []
        dones = torch.zeros(b)
        predicted = None
        for i in range(lengths):
            y_prev = torch.zeros((b,), dtype=x.dtype) if i == 0 else predicted
            output, state, _ = self.decoder(x, state, y_prev)
            probs = torch.softmax(output, dim=1)
            _, predicted = probs.max(1)
            outputs.append(probs.unsqueeze(1))
            dones += (predicted == eos).float()
            if dones.min() != 0:
                break
        outputs = torch.cat(outputs, 1)
        outputs_[:, : outputs.shape[1], :] = outputs
        return outputs_

    def forward_train(self, x, targets, lengths):
        """Teacher-forced forward (prediction_aster.py:33-61)."""
        b = x.size(0)
        state = torch.zeros(1, b, self.sDim, dtype=x.dtype)
        outputs = []
        for i in range(lengths):
            y_prev = (torch.zeros((b,), dtype=x.dtype) if i == 0
                      else targets[:, i].to(x.dtype))
            output, state, _ = self.decoder(x, state, y_prev)
            outputs.append(output.unsqueeze(1))
        return torch.cat(outputs, 1)


class TorchASTERDecoder(nn.Module):
    """ASTER_V2 wrapper: the child is named ``recognizer`` —
    reproducing the ``decoder.recognizer.decoder.*`` naming chain."""

    def __init__(self, num_classes, max_word_len, in_channels):
        super().__init__()
        self.max_word_len = max_word_len
        self.recognizer = TorchAttentionRecognitionHead(
            num_classes, in_channels, in_channels, in_channels
        )

    def forward(self, features):
        return self.recognizer.sample(features, self.max_word_len, eos=0)


class TorchRecognizerHead(nn.Module):
    """RecognizerRCNNHeadV3 module layout (recognizer_head_v2.py:190-207)."""

    def __init__(self, ch=256, vocab=97, max_word_len=25):
        super().__init__()
        self.backbone = TorchCNN_V1_1(ch)
        self.encoder = TorchRecognizerEncoder(ch)
        self.decoder = TorchASTERDecoder(vocab, max_word_len + 1, ch)

    def forward(self, fused):  # fused: (N, C, 8, 32)
        x = self.backbone(fused)
        enc = self.encoder(x)
        return self.decoder(enc)


# ---------------------------------------------------------------------------
# Full model
# ---------------------------------------------------------------------------


class TorchROIHeads(nn.Module):
    def __init__(self, fpn_ch=256, fc_dim=2048, num_anchors=12, vocab=97,
                 local_out=256, box_pool=7, max_word_len=25):
        super().__init__()
        self.box_head = TorchBoxHead(fpn_ch * box_pool * box_pool, fc_dim)
        self.box_predictor = TorchBoxPredictor(fc_dim)
        self.mask_head = TorchMaskHead(fpn_ch)
        self.recognizer_feature_fusion = TorchP2P3Fusion(fpn_ch)
        self.hybrid_net = TorchHybridNet(local_out)
        self.fusion_net = TorchGCAttention(local_out + fpn_ch, 0.5, 8, fpn_ch)
        self.recognizer_head = TorchRecognizerHead(fpn_ch, vocab, max_word_len)


class TorchProposalGenerator(nn.Module):
    def __init__(self, fpn_ch=256, num_anchors=12, n_levels=5):
        super().__init__()
        self.rpn_head = TorchRPNHead(fpn_ch, num_anchors)
        # d2 RotatedAnchorGenerator keeps cell anchors in a BufferList —
        # present in some torch state dicts; the converter must skip them.
        cell = nn.Module()
        for i in range(n_levels):
            cell.register_buffer(str(i), torch.zeros(num_anchors, 5))
        anchor_generator = nn.Module()
        anchor_generator.cell_anchors = cell
        self.anchor_generator = anchor_generator


class TorchGlassModel(nn.Module):
    def __init__(self, width=64, fpn_ch=256, fc_dim=2048, num_anchors=12,
                 vocab=97, local_out=256, max_word_len=25):
        super().__init__()
        self.backbone = TorchBackboneFPN(width, fpn_ch)
        self.proposal_generator = TorchProposalGenerator(fpn_ch, num_anchors)
        self.roi_heads = TorchROIHeads(fpn_ch, fc_dim, num_anchors, vocab,
                                       local_out, max_word_len=max_word_len)
        # GeneralizedRCNN normalization buffers (persistent in some exports).
        self.register_buffer("pixel_mean", torch.zeros(3, 1, 1))
        self.register_buffer("pixel_std", torch.ones(3, 1, 1))

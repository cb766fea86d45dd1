"""Independent PyTorch mirror of the reference CATRE architecture, used only
to generate golden values for parity tests (the reference itself cannot be
imported here: it requires mmcv/detectron2).

Module/key structure intentionally matches the reference state-dict layout
(SURVEY.md §3.5) so `torch_state_dict_to_params` is exercised on the real
checkpoint format.
"""

import torch
import torch.nn as nn
import torch.nn.functional as F


class TorchSTN(nn.Module):
    def __init__(self, k=3):
        super().__init__()
        self.conv1 = nn.Conv1d(k, 64, 1)
        self.conv2 = nn.Conv1d(64, 128, 1)
        self.conv3 = nn.Conv1d(128, 1024, 1)
        self.fc1 = nn.Linear(1024, 512)
        self.fc2 = nn.Linear(512, 256)
        self.fc3 = nn.Linear(256, k * k)
        self.k = k

    def forward(self, x):  # x: (B, k, P)
        b = x.shape[0]
        h = F.relu(self.conv1(x))
        h = F.relu(self.conv2(h))
        h = F.relu(self.conv3(h))
        h = torch.max(h, 2)[0]
        h = F.relu(self.fc1(h))
        h = F.relu(self.fc2(h))
        h = self.fc3(h)
        iden = torch.eye(self.k).flatten().unsqueeze(0).repeat(b, 1)
        return (h + iden).view(-1, self.k, self.k)


class TorchPointNetFeat(nn.Module):
    def __init__(self, out_dim=1024, feature_transform=True, global_feat=False):
        super().__init__()
        self.stn = TorchSTN(3)
        self.conv1 = nn.Conv1d(3, 64, 1)
        self.conv2 = nn.Conv1d(64, 128, 1)
        self.conv3 = nn.Conv1d(128, 512, 1)
        self.conv4 = nn.Conv1d(512, out_dim, 1)
        self.out_dim = out_dim
        self.global_feat = global_feat
        self.feature_transform = feature_transform
        if feature_transform:
            self.fstn = TorchSTN(64)

    def forward(self, x):  # x: (B, 3, P)
        n_pts = x.shape[2]
        trans = self.stn(x)
        x = torch.bmm(x.transpose(2, 1), trans).transpose(2, 1)
        x = F.relu(self.conv1(x))
        if self.feature_transform:
            tf = self.fstn(x)
            x = torch.bmm(x.transpose(2, 1), tf).transpose(2, 1)
        pointfeat = x
        x = F.relu(self.conv2(x))
        x = F.relu(self.conv3(x))
        x = self.conv4(x)
        x = torch.max(x, 2, keepdim=True)[0].view(-1, self.out_dim)
        if self.global_feat:
            return x
        g = x.view(-1, self.out_dim, 1).repeat(1, 1, n_pts)
        return torch.cat([g, pointfeat], 1)


class TorchRotHead(nn.Module):
    def __init__(self, in_dim=1088, feat_dim=256, rot_dim=3, num_points=2048, gn_groups=32):
        super().__init__()
        self.layers = nn.ModuleList(
            [
                nn.Conv1d(in_dim, feat_dim, 1),
                nn.GroupNorm(gn_groups, feat_dim),
                nn.GELU(),
                nn.Conv1d(feat_dim, feat_dim, 1),
                nn.GroupNorm(gn_groups, feat_dim),
                nn.GELU(),
            ]
        )
        self.neck = nn.ModuleList([nn.Conv1d(feat_dim, rot_dim, 1)])
        self.conv_p = nn.Conv1d(num_points, 1, 1, bias=True)

    def forward(self, x):  # x: (B, C, P)
        for layer in self.layers:
            x = layer(x)
        for layer in self.neck:
            x = layer(x)
        x = x.permute(0, 2, 1)
        x = self.conv_p(x)
        return x.squeeze(1)


class TorchConvOutPerRotHead(nn.Module):
    def __init__(self, **kw):
        super().__init__()
        self.rot_head_x = TorchRotHead(**kw)
        self.rot_head_y = TorchRotHead(**kw)

    def forward(self, x):
        return torch.cat([self.rot_head_x(x), self.rot_head_y(x)], dim=1)


class TorchTSHead(nn.Module):
    def __init__(self, in_dim=1091, feat_dim=256, gn_groups=32):
        super().__init__()
        self.linears = nn.ModuleList(
            [
                nn.Linear(in_dim, feat_dim),
                nn.GroupNorm(gn_groups, feat_dim),
                nn.GELU(),
                nn.Linear(feat_dim, feat_dim),
                nn.GroupNorm(gn_groups, feat_dim),
                nn.GELU(),
            ]
        )
        self.fc_t = nn.Linear(feat_dim, 3)
        self.fc_s = nn.Linear(feat_dim, 3)

    def forward(self, x):
        for layer in self.linears:
            x = layer(x)
        return self.fc_t(x), self.fc_s(x)


class TorchCATRE(nn.Module):
    """Mirror of CATRE_disR_shared with the shipped config
    (WITH_KPS_FEATURE=False, WITH_INIT_SCALE=True)."""

    def __init__(self):
        super().__init__()
        self.pcl_net = TorchPointNetFeat()
        self.rot_head = TorchConvOutPerRotHead()
        self.ts_head = TorchTSHead()

    def forward(self, x, tfd_kps, init_scale):  # (B,3,P), (B,3,K), (B,3)
        pcl_feat = self.pcl_net(x)
        kps_feat = self.pcl_net(tfd_kps)
        flat = torch.max(pcl_feat, 2)[0]
        ts_feat = torch.cat([flat, init_scale], dim=1)
        trans_d, scale_d = self.ts_head(ts_feat)
        rot_feat = torch.cat([pcl_feat, kps_feat], dim=2)
        rot_d = self.rot_head(rot_feat)
        return rot_d, trans_d, scale_d

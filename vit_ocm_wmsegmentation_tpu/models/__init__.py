"""Model zoo: DINO-style ViT backbone, SimMIM, linear probing, UNet, Swin."""

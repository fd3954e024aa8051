data "aws_ami" "amzn" {
  most_recent = false
  owners      = ["amazon"]
  filter {
    name   = "name"
    values = ["amzn2-ami-hvm-*"]
  }
  filter {
    name   = "architecture"
    values = ["x86_64"]
  }
}

module "s3_bucket" {
  source = "git::https://gitlab.com/acme/s3?ref=v1.2.0"
}
module "net" {
  source = "git::https://gitlab.com/acme/net?ref=2abc"
}

output "bucket_arn" {
  value = aws_s3_bucket.logs.arn
}
